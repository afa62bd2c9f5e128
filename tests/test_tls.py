"""TLS manager: self-signed generation, SANs, context reload."""
import ssl

import pytest

from vectorsearch_tpu.api import tls as tls_mod
from vectorsearch_tpu.config import TLSConfig

cryptography = pytest.importorskip("cryptography")
from cryptography import x509


def test_self_signed_has_sans_and_parses():
    cert_pem, key_pem = tls_mod.generate_self_signed(["example.test"], ["10.1.2.3"])
    cert = x509.load_pem_x509_certificate(cert_pem)
    san = cert.extensions.get_extension_for_class(x509.SubjectAlternativeName).value
    dns = san.get_values_for_type(x509.DNSName)
    ips = [str(ip) for ip in san.get_values_for_type(x509.IPAddress)]
    assert "localhost" in dns and "example.test" in dns
    assert "127.0.0.1" in ips and "10.1.2.3" in ips
    # ECDSA P-384 like the reference (config/config_tls.go)
    assert cert.signature_hash_algorithm.name == "sha384"


def test_manager_builds_and_reloads_context():
    mgr = tls_mod.TLSManager(TLSConfig(), reload_interval=3600)
    ctx = mgr.context()
    assert isinstance(ctx, ssl.SSLContext)
    first = mgr._ctx
    mgr.reload()
    assert mgr._ctx is not first  # fresh context swapped in
    mgr.close()


def test_manager_with_configured_cert(tmp_path):
    cert_pem, key_pem = tls_mod.generate_self_signed()
    cert_path = tmp_path / "c.pem"
    key_path = tmp_path / "k.pem"
    cert_path.write_bytes(cert_pem)
    key_path.write_bytes(key_pem)
    cfg = TLSConfig(
        certificates=[{"certificate": str(cert_path), "key": str(key_path)}]
    )
    mgr = tls_mod.TLSManager(cfg, reload_interval=3600)
    assert isinstance(mgr.context(), ssl.SSLContext)
    mgr.close()
