"""JSON configuration (reference: config/config.go, config/sample.go).

Same document shape as the reference so existing config files port over:
  server{http_address, https_address}, tls{...}, database{...},
  ollama{embed/generate/chat provider blocks}, openai{...}, log_level.
Scalar-or-list fields (api_base, sqlite DSNs — reference
config/config_database.go:62-85 SingleOrSlice) accept both forms.
Engine tuning constants stay compile-time (constants.py), as in the
reference (config/constants.go).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


def _as_list(v) -> list:
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v]


@dataclass
class Provider:
    """One model endpoint group (reference: config/config_ai.go Provider)."""

    api_base: list[str] = field(default_factory=list)
    token: str = ""
    model: str = ""
    num_ctx: int = 8192
    request_compression: bool = False

    @staticmethod
    def parse(d: dict | None) -> "Provider | None":
        if not d:
            return None
        return Provider(
            api_base=_as_list(d.get("api_base")),
            token=d.get("token", ""),
            model=d.get("model", ""),
            num_ctx=int(d.get("num_ctx", 8192)),
            request_compression=bool(d.get("request_compression", False)),
        )

    def to_dict(self) -> dict:
        return {
            "api_base": self.api_base,
            "token": self.token,
            "model": self.model,
            "num_ctx": self.num_ctx,
            "request_compression": self.request_compression,
        }


@dataclass
class AIConfig:
    embed: Provider | None = None
    generate: Provider | None = None
    chat: Provider | None = None

    @staticmethod
    def parse(d: dict | None) -> "AIConfig":
        d = d or {}
        return AIConfig(
            embed=Provider.parse(d.get("embed")),
            generate=Provider.parse(d.get("generate")),
            chat=Provider.parse(d.get("chat")),
        )

    def to_dict(self) -> dict:
        return {
            "embed": self.embed.to_dict() if self.embed else None,
            "generate": self.generate.to_dict() if self.generate else None,
            "chat": self.chat.to_dict() if self.chat else None,
        }


@dataclass
class DatabaseConfig:
    sqlite: str = "./vectorstore.db"
    postgres: list[str] = field(default_factory=list)
    # read-only replica DSNs: reads route strict-round-robin over these
    # while writes pin to postgres[0] (reference: database/database.go:86-103)
    postgres_readonly: list[str] = field(default_factory=list)
    # `cache` is accepted for config-file compatibility with the reference
    # (its dnc/ builder staged temp files there, purged at boot —
    # database/database.go:31-44); this rebuild stages nothing on disk, so
    # the field is unused. Snapshots live under `snapshots`.
    cache: str = "./vectorcache"
    snapshots: str = "./snapshots"
    log_level: str = "error"
    # multi-instance: seconds between store-divergence syncs (0 = off).
    # Other instances' writes become visible within this window (the
    # reference's window is its per-search SQL read + 5s centroid cache).
    sync_interval: float = 0.0
    # cross-host shared store (store/remote.py, the Postgres-role
    # analogue): `remote` mounts another instance's store server
    # ("http://host:port"); `serve_store` additionally serves THIS
    # instance's sqlite store at "host:port" for others to mount.
    remote: str = ""
    serve_store: str = ""
    # shared secret for the store RPC: serve_store rejects requests
    # without it, remote sends it (the Postgres path has real auth; the
    # RPC substitute must not be an open write endpoint)
    store_token: str = ""

    @staticmethod
    def parse(d: dict | None) -> "DatabaseConfig":
        d = d or {}
        return DatabaseConfig(
            # scalar-or-list (reference SingleOrSlice): list form takes
            # the first DSN — os.path.abspath(list) would die at boot
            sqlite=(_as_list(d.get("sqlite")) or ["./vectorstore.db"])[0],
            postgres=_as_list(d.get("postgres")),
            postgres_readonly=_as_list(d.get("postgres_readonly")),
            cache=d.get("cache", "./vectorcache"),
            snapshots=d.get("snapshots", "./snapshots"),
            log_level=d.get("log_level", "error"),
            sync_interval=float(d.get("sync_interval", 0.0)),
            remote=d.get("remote", ""),
            serve_store=d.get("serve_store", ""),
            store_token=d.get("store_token", ""),
        )

    def to_dict(self) -> dict:
        return {
            "sqlite": self.sqlite,
            "postgres": self.postgres,
            "postgres_readonly": self.postgres_readonly,
            "cache": self.cache,
            "snapshots": self.snapshots,
            "log_level": self.log_level,
            "sync_interval": self.sync_interval,
            "remote": self.remote,
            "serve_store": self.serve_store,
            "store_token": self.store_token,
        }


@dataclass
class TLSConfig:
    """Certificate config (reference: config/config_tls.go). Self-signed
    generation + hourly reload are implemented in api/tls.py."""

    domain_name_server: list[str] = field(default_factory=list)
    ip: list[str] = field(default_factory=list)
    certificates: list[dict] = field(default_factory=list)  # {cert, key} paths

    @staticmethod
    def parse(d: dict | None) -> "TLSConfig":
        d = d or {}
        return TLSConfig(
            domain_name_server=_as_list(d.get("domain_name_server")),
            ip=_as_list(d.get("ip")),
            certificates=_as_list(d.get("certificates")),
        )

    def to_dict(self) -> dict:
        return {
            "domain_name_server": self.domain_name_server,
            "ip": self.ip,
            "certificates": self.certificates,
        }


@dataclass
class ServerConfig:
    http_address: str = ":7500"
    https_address: str = ":7501"
    # Probe widths Engine.warmup precompiles at boot so the first real
    # request at the deployment's serving nprobe pays no jit latency
    # (each pair is a 30-120s remote-tunnel compile). Empty = auto:
    # (1,) per category, (1, 8) above ~1M rows. TPU-native addition —
    # the reference has no compilation step to warm.
    warm_nprobes: tuple = ()

    @staticmethod
    def parse(d: dict | None) -> "ServerConfig":
        d = d or {}
        return ServerConfig(
            http_address=d.get("http_address", ":7500"),
            https_address=d.get("https_address", ":7501"),
            warm_nprobes=tuple(
                int(x) for x in d.get("warm_nprobes", ())
            ),
        )

    def to_dict(self) -> dict:
        return {
            "http_address": self.http_address,
            "https_address": self.https_address,
            "warm_nprobes": list(self.warm_nprobes),
        }


@dataclass
class MeshConfig:
    """TPU-native addition: device mesh for sharded serving/builds.

    Multi-host: set `coordinator` ("host0:port"), `num_processes`, and
    `process_id` on every instance; jax.distributed.initialize runs before
    first device use and the mesh then spans every host's chips
    (parallel/distributed.py, SURVEY.md §2.8 last row)."""

    devices: int = 0  # 0 = all (global, after distributed init) devices
    shard_serving: bool = False  # shard the serving index over the mesh
    coordinator: str = ""  # "" = single-host (no distributed runtime)
    num_processes: int = 1
    process_id: int = 0

    @staticmethod
    def parse(d: dict | None) -> "MeshConfig":
        d = d or {}
        return MeshConfig(
            devices=int(d.get("devices", 0)),
            shard_serving=bool(d.get("shard_serving", False)),
            coordinator=d.get("coordinator", ""),
            num_processes=int(d.get("num_processes", 1)),
            process_id=int(d.get("process_id", 0)),
        )

    def to_dict(self) -> dict:
        return {
            "devices": self.devices,
            "shard_serving": self.shard_serving,
            "coordinator": self.coordinator,
            "num_processes": self.num_processes,
            "process_id": self.process_id,
        }


@dataclass
class Config:
    server: ServerConfig = field(default_factory=ServerConfig)
    tls: TLSConfig = field(default_factory=TLSConfig)
    database: DatabaseConfig = field(default_factory=DatabaseConfig)
    ollama: AIConfig = field(default_factory=AIConfig)
    openai: AIConfig = field(default_factory=AIConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    log_level: str = "info"

    @staticmethod
    def parse(raw: str | bytes) -> "Config":
        d = json.loads(raw)
        return Config(
            server=ServerConfig.parse(d.get("server")),
            tls=TLSConfig.parse(d.get("tls")),
            database=DatabaseConfig.parse(d.get("database")),
            ollama=AIConfig.parse(d.get("ollama")),
            openai=AIConfig.parse(d.get("openai")),
            mesh=MeshConfig.parse(d.get("mesh")),
            log_level=d.get("log_level", "info"),
        )

    def to_dict(self) -> dict:
        return {
            "server": self.server.to_dict(),
            "tls": self.tls.to_dict(),
            "database": self.database.to_dict(),
            "ollama": self.ollama.to_dict(),
            "openai": self.openai.to_dict(),
            "mesh": self.mesh.to_dict(),
            "log_level": self.log_level,
        }


def load(path: str) -> Config:
    with open(path, "rb") as f:
        return Config.parse(f.read())


def create_sample(path: str) -> None:
    """Write a sample config on first run (reference: config/sample.go:12-61,
    main.go:35-55)."""
    sample = Config(
        ollama=AIConfig(
            embed=Provider(
                api_base=["http://localhost:11434"],
                model="nomic-embed-text",
                num_ctx=8192,
            ),
            generate=Provider(
                api_base=["http://localhost:11434"],
                model="llama3.2",
                num_ctx=128_000,
            ),
            chat=Provider(
                api_base=["http://localhost:11434"],
                model="llama3.2",
                num_ctx=128_000,
            ),
        ),
    )
    with open(path, "w") as f:
        json.dump(sample.to_dict(), f, indent=4)
    os.chmod(path, 0o600)
