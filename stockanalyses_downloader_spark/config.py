"""Engine configuration with file -> env precedence.

Mirrors the reference's config resolution contract (main.py:30-62: read
``config.ini`` if present, else fall back to ``STOXYGEN_*`` environment
variables) without its hard exit on partial config. Keys here configure
the engine's sources/sinks; Spark-level tuning lives in session.py.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field, fields

_ENV_PREFIX = "STOXYGEN_"


@dataclass(frozen=True)
class EngineConfig:
    # job/source endpoints (used only by the live connectors, never tests)
    api_url: str = ""
    api_username: str = ""
    api_password: str = ""
    # message-queue sink
    mq_host: str = ""
    mq_username: str = ""
    mq_password: str = ""
    mq_queue: str = "import_jq"
    # engine behavior
    database_version: int = 1           # schema gate (reference main.py:66,443-445)
    checkpoint_dir: str = "/tmp/stockanalyses_spark_ckpt"
    extras: dict = field(default_factory=dict)


def load_config(path: str | None = None,
                env: dict[str, str] | None = None) -> EngineConfig:
    """File section [engine] if the file exists, else STOXYGEN_<KEY> env vars."""
    env = os.environ if env is None else env
    values: dict[str, object] = {}
    if path and os.path.exists(path):
        parser = configparser.ConfigParser()
        parser.read(path)
        if parser.has_section("engine"):
            values.update(dict(parser.items("engine")))
    for f in fields(EngineConfig):
        env_key = _ENV_PREFIX + f.name.upper()
        if f.name not in values and env_key in env:
            values[f.name] = env[env_key]
    if "database_version" in values:
        values["database_version"] = int(values["database_version"])
    known = {f.name for f in fields(EngineConfig)}
    extras = {k: v for k, v in values.items() if k not in known}
    values = {k: v for k, v in values.items() if k in known}
    return EngineConfig(**values, extras=extras) if extras else EngineConfig(**values)


def check_schema_version(actual: int, cfg: EngineConfig) -> None:
    """Pre-flight schema gate: refuse to run against an older schema
    (reference semantics: main.py:443-445,459-461)."""
    if actual < cfg.database_version:
        raise RuntimeError(
            f"schema version {actual} older than engine requirement "
            f"{cfg.database_version}; refusing to run")
