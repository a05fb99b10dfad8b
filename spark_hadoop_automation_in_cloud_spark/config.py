"""YAML config layer — operational parity with the reference's ``Config``
class (``src/config/config.py:108-135``): one ``config.yaml`` drives every
job (per-job window/date/paths under ``spark.jobs.<job_name>``), the Spark
application name, and logging levels.

Differences from the reference, on purpose:
- the reference walks the whole project tree with ``os.walk`` to locate
  the file; we walk UP from the starting directory (predictable in deep
  checkouts and temp dirs) and accept an explicit path everywhere.
- values land in the validated ``JobArgs`` / ``SessionConfig`` dataclasses
  instead of raw dict access at use sites, so a bad config fails at load
  time with the same errors the argv path raises.

PyYAML is an optional dependency: everything else in the engine works
without it, and ``load_config`` raises a clear error when it is missing.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path
from typing import Any

from spark_hadoop_automation_in_cloud_spark.args import JobArgs
from spark_hadoop_automation_in_cloud_spark.session import SessionConfig

try:  # optional dependency — gate, don't hard-require
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

CONFIG_NAME = "config.yaml"


class ConfigError(RuntimeError):
    """Missing/unparseable config file or a missing job entry."""


def find_config(start: str | Path | None = None) -> Path:
    """Locate ``config.yaml`` in ``start`` (default cwd), its ``config/``
    subdirectory, or any ancestor directory — nearest wins."""
    base = Path(start) if start is not None else Path.cwd()
    for d in (base, *base.parents):
        for cand in (d / CONFIG_NAME, d / "config" / CONFIG_NAME):
            if cand.is_file():
                return cand
    raise ConfigError(
        f"no {CONFIG_NAME} found from {base} upward — create one or pass "
        "an explicit path"
    )


def load_config(path: str | Path | None = None) -> dict[str, Any]:
    """Parse the YAML config into a plain dict (``safe_load`` only)."""
    if yaml is None:
        raise ConfigError("PyYAML is not installed; pass args via argv instead")
    p = Path(path) if path is not None else find_config()
    try:
        data = yaml.safe_load(p.read_text())
    except OSError as exc:
        raise ConfigError(f"cannot read {p}: {exc}") from exc
    except yaml.YAMLError as exc:
        raise ConfigError(f"cannot parse {p}: {exc}") from exc
    if not isinstance(data, dict):
        raise ConfigError(f"{p} must contain a mapping, got {type(data).__name__}")
    return data


def job_args(cfg: dict[str, Any], job_name: str) -> JobArgs:
    """``spark.jobs.<job_name>`` → validated :class:`JobArgs`.

    YAML parses bare dates as ``datetime.date`` — normalized back to the
    ISO string the dataclass validates, so both spellings work.
    """
    jobs = cfg.get("spark", {}).get("jobs") or {}
    if job_name not in jobs:
        raise ConfigError(
            f"job {job_name!r} not in config (have: {sorted(jobs) or 'none'})"
        )
    spec = jobs[job_name]
    date = spec.get("date")
    if isinstance(date, dt.date):
        date = date.isoformat()
    try:
        return JobArgs(
            date=str(date),
            depth=int(spec["depth"]),
            src_path=str(spec["src_path"]),
            tgt_path=str(spec["tgt_path"]),
            coords_path=spec.get("coords_path"),
            processed_dttm=spec.get("processed_dttm"),
        )
    except KeyError as exc:
        raise ConfigError(f"job {job_name!r} is missing key {exc}") from exc


def session_config(cfg: dict[str, Any]) -> SessionConfig:
    """``spark.application_name`` + ``logging.level.java`` → SessionConfig
    (the reference upper-cases both; same here)."""
    spark = cfg.get("spark", {})
    level = (cfg.get("logging", {}).get("level", {}).get("java") or "warn").upper()
    kwargs: dict[str, Any] = {"log_level": level}
    if spark.get("application_name"):
        kwargs["app_name"] = str(spark["application_name"]).upper()
    return SessionConfig(**kwargs)


def resolve_job_args(argv: list[str], job_name: str) -> JobArgs:
    """Shared CLI entry for jobs/*.py: positional argv (reference contract)
    or ``--config <path> [--job <name>]`` (config-file contract)."""
    if argv and argv[0] == "--config":
        if len(argv) < 2:
            raise ValueError("usage: --config <path> [--job <job_name>]")
        name = argv[3] if len(argv) > 3 and argv[2] == "--job" else job_name
        return job_args(load_config(argv[1]), name)
    return JobArgs.from_argv(argv)
