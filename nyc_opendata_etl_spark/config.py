"""Typed runtime configuration: warehouse targets + API token plumbing.

Reference parity surface: ``config/__init__.py:5-27`` (TOML →
TypedDict settings: BigQuery project/dataset + logical→physical table
name map) and ``config/env.py:1-7`` (``.env`` → ``NYC_API_TOKEN``).
Re-expressed with stdlib only: ``tomllib`` for the settings file and a
minimal ``.env`` parser instead of python-dotenv (not in this
environment, and 6 lines of format are not worth a dependency).

Precedence for the token: real environment variable first, then the
``.env`` file — so a deployment env var always wins over a checked-in
developer file.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass
from pathlib import Path

TOKEN_VAR = "NYC_API_TOKEN"

# Logical name → physical table name (reference settings.toml [tables]).
DEFAULT_TABLES: dict[str, str] = {
    "agency_dim": "dim_agency",
    "complaint_dim": "dim_complaint",
    "date_dim": "dim_date",
    "time_dim": "dim_time",
    "location_dim": "dim_location",
    "parking_location_dim": "dim_parking_location",
    "vehicle_dim": "dim_vehicle",
    "violation_dim": "dim_violation",
    "fact_311_complaints": "fact_311_complaints",
    "fact_parking_tickets": "fact_parking_tickets",
    "integrated_fact_service_requests": "integrated_fact_service_requests",
}


@dataclass(frozen=True)
class BigQueryConfig:
    project_id: str | None
    dataset: str | None


@dataclass(frozen=True)
class Settings:
    bigquery: BigQueryConfig
    tables: dict[str, str]
    api_token: str | None

    def table(self, logical: str) -> str:
        return self.tables[logical]

    def bq_table_id(self, logical: str) -> str:
        if not (self.bigquery.project_id and self.bigquery.dataset):
            raise ValueError("bigquery project_id/dataset not configured")
        return f"{self.bigquery.project_id}.{self.bigquery.dataset}.{self.table(logical)}"


def parse_env_file(path: str | Path) -> dict[str, str]:
    """Minimal ``.env`` parser: ``KEY=VALUE`` lines, ``#`` comments,
    optional single/double quotes around the value, no interpolation."""
    out: dict[str, str] = {}
    p = Path(path)
    if not p.exists():
        return out
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        val = val.strip()
        if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
            val = val[1:-1]
        if key:
            out[key] = val
    return out


def api_token(env_file: str | Path | None = None) -> str | None:
    """``NYC_API_TOKEN`` from the environment, else from ``.env``."""
    tok = os.environ.get(TOKEN_VAR)
    if tok:
        return tok
    if env_file is None:
        env_file = Path.cwd() / ".env"
    return parse_env_file(env_file).get(TOKEN_VAR)


def load_settings(
    settings_file: str | Path | None = None,
    env_file: str | Path | None = None,
) -> Settings:
    """Load typed settings; every field has a working default, so a
    missing TOML file yields a usable offline configuration."""
    raw: dict = {}
    if settings_file is not None and Path(settings_file).exists():
        with open(settings_file, "rb") as f:
            raw = tomllib.load(f)
    bq = raw.get("bigquery", {})
    tables = {**DEFAULT_TABLES, **raw.get("tables", {})}
    return Settings(
        bigquery=BigQueryConfig(bq.get("project_id"), bq.get("dataset")),
        tables=tables,
        api_token=api_token(env_file),
    )
