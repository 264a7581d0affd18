"""Config plumbing, SoQL hardening, Socrata HTTP replay, BigQuery sink
contract — the reference-parity surfaces that need no network/jar.

Reference behaviors mirrored: ``config/__init__.py:5-27`` (TOML typed
settings), ``config/env.py:1-7`` (.env token), ``load_311.py:11-17``
(SoQL window request shape), ``load_311.py:113-126`` /
``dim_loader.py:23-30`` (config-composed table id, WRITE_APPEND, empty
no-op).
"""

from __future__ import annotations

import io
import json
import urllib.parse
import urllib.request

import pytest

from nyc_opendata_etl_spark.config import (
    DEFAULT_TABLES,
    api_token,
    load_settings,
    parse_env_file,
)
from nyc_opendata_etl_spark.sources import socrata as soc
from nyc_opendata_etl_spark.sources.sinks import append_bigquery, append_bigquery_table


# ── config ──────────────────────────────────────────────────────────────


def test_parse_env_file(tmp_path):
    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "NYC_API_TOKEN=abc123\n"
        "QUOTED='with space'\n"
        'DQUOTED="x=y"\n'
        "   \n"
        "garbage-line\n"
    )
    env = parse_env_file(p)
    assert env == {"NYC_API_TOKEN": "abc123", "QUOTED": "with space", "DQUOTED": "x=y"}


def test_api_token_env_var_beats_dotenv(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text("NYC_API_TOKEN=from_file\n")
    monkeypatch.delenv("NYC_API_TOKEN", raising=False)
    assert api_token(p) == "from_file"
    monkeypatch.setenv("NYC_API_TOKEN", "from_env")
    assert api_token(p) == "from_env"


def test_load_settings_defaults_and_toml_override(tmp_path, monkeypatch):
    monkeypatch.delenv("NYC_API_TOKEN", raising=False)
    s = load_settings(env_file=tmp_path / "absent.env")
    assert s.tables == DEFAULT_TABLES
    assert s.api_token is None
    with pytest.raises(ValueError):
        s.bq_table_id("vehicle_dim")

    toml = tmp_path / "settings.toml"
    toml.write_text(
        '[bigquery]\nproject_id = "proj"\ndataset = "stage"\n'
        '[tables]\nvehicle_dim = "dim_vehicle_v2"\n'
    )
    s2 = load_settings(toml, env_file=tmp_path / "absent.env")
    assert s2.bq_table_id("vehicle_dim") == "proj.stage.dim_vehicle_v2"
    # unmentioned tables keep defaults
    assert s2.table("date_dim") == "dim_date"


# ── SoQL hardening ──────────────────────────────────────────────────────


def test_soql_window_escapes_quotes_and_validates_column():
    w = soc.soql_window("created_date", "2024-01-01", "2024-02-01")
    assert w == "created_date >= '2024-01-01' AND created_date < '2024-02-01'"
    w2 = soc.soql_window("created_date", "it's", "x")
    assert "'it''s'" in w2
    with pytest.raises(ValueError):
        soc.soql_window("created_date; DROP", "a", "b")


# ── Socrata recorded-response replay ────────────────────────────────────


class _CannedResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_socrata_paging_url_sequence_and_parse(monkeypatch):
    """Drive the REAL request-building/paging/parse path against canned
    HTTP responses; assert the exact $where/$limit/$offset sequence the
    reference's windowed scan implies (load_311.py:11-17)."""
    from pyspark.sql.types import StringType, StructField, StructType

    seen_urls: list[str] = []
    seen_headers: list[dict] = []
    pages = {
        0: [{"unique_key": "1", "agency": "NYPD"}, {"unique_key": "2", "agency": None}],
        2: [{"unique_key": "3", "agency": "DOT"}],
    }

    def fake_urlopen(req, timeout=None):
        seen_urls.append(req.full_url)
        seen_headers.append(dict(req.header_items()))
        offset = int(urllib.parse.parse_qs(urllib.parse.urlparse(req.full_url).query)["$offset"][0])
        return _CannedResponse(json.dumps(pages.get(offset, [])).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    monkeypatch.delenv("NYC_API_TOKEN", raising=False)

    schema = StructType(
        [StructField("unique_key", StringType()), StructField("agency", StringType())]
    )
    where = soc.soql_window("created_date", "2024-01-01", "2024-02-01")
    reader = soc.SocrataReader(
        schema,
        {
            "dataset": soc.DATASET_311,
            "where": where,
            "limit": "3",
            "page_size": "2",
            "app_token": "tok-xyz",
        },
    )
    parts = reader.partitions()
    assert [(p.offset, p.limit) for p in parts] == [(0, 2), (2, 1)]

    rows = [row for p in parts for row in reader.read(p)]
    assert rows == [("1", "NYPD"), ("2", None), ("3", "DOT")]

    assert len(seen_urls) == 2
    for url, (off, lim) in zip(seen_urls, [(0, 2), (2, 1)]):
        parsed = urllib.parse.urlparse(url)
        q = urllib.parse.parse_qs(parsed.query)
        assert parsed.scheme == "https"
        assert parsed.netloc == soc.DEFAULT_DOMAIN
        assert parsed.path == f"/resource/{soc.DATASET_311}.json"
        assert q["$where"] == [where]
        assert q["$offset"] == [str(off)]
        assert q["$limit"] == [str(lim)]
        assert q["$order"] == [":id"]  # stable paging order
    assert all(h.get("X-app-token") == "tok-xyz" for h in seen_headers)


def test_socrata_reader_token_falls_back_to_env(monkeypatch):
    from pyspark.sql.types import StringType, StructField, StructType

    monkeypatch.setenv("NYC_API_TOKEN", "env-token")
    schema = StructType([StructField("unique_key", StringType())])
    reader = soc.SocrataReader(schema, {})
    assert reader.token == "env-token"
    # explicit option wins
    reader2 = soc.SocrataReader(schema, {"app_token": "opt"})
    assert reader2.token == "opt"


# ── BigQuery sink contract (no jar needed) ──────────────────────────────


class _RecordingWriter:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def mode(self, m):
        self.log["mode"] = m
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def save(self):
        self.log["saved"] = True


class _FakeDF:
    def __init__(self, empty=False):
        self.log = {}
        self._empty = empty

    def isEmpty(self):
        return self._empty

    @property
    def write(self):
        return _RecordingWriter(self.log)


def test_append_bigquery_passes_reference_contract():
    df = _FakeDF()
    append_bigquery(df, "proj.stage.fact_311_complaints")
    assert df.log == {
        "format": "bigquery",
        "mode": "append",  # WRITE_APPEND disposition (dim_loader.py:28)
        "options": {
            "table": "proj.stage.fact_311_complaints",
            "writeMethod": "direct",
        },
        "saved": True,
    }


def test_append_bigquery_empty_is_noop():
    df = _FakeDF(empty=True)
    append_bigquery(df, "p.d.t")
    assert df.log == {}  # dim_loader.py:24-26 empty guard


def test_append_bigquery_table_composes_id_from_settings(tmp_path):
    toml = tmp_path / "settings.toml"
    toml.write_text('[bigquery]\nproject_id = "proj"\ndataset = "stage"\n')
    settings = load_settings(toml, env_file=tmp_path / "absent.env")
    df = _FakeDF()
    append_bigquery_table(df, settings, "fact_311_complaints")
    assert df.log["options"]["table"] == "proj.stage.fact_311_complaints"
