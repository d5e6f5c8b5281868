"""Typed model + validation for the source-config "query language".

The reference's only user-facing schema is its ``sources.json`` config
(reference sources.json:1-106, README.md:51-80): a list of source configs,
each routing a GCS prefix to a set of field-mapping rules. The reference
interprets these dicts per row (main.py:164-293); here they are a typed,
validated model that the plan compiler (plans/compiler.py) turns into
Catalyst Column expressions once, on the driver.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

CAST_TYPES = {
    "string",
    "integer",
    "float",
    "boolean",
    "unix_timestamp_auto",
    "string_or_uuid",
    "passthrough",
}

WILDCARD = "*"


class ConfigError(ValueError):
    """Invalid source config."""


@dataclass(frozen=True)
class FieldMapping:
    """One field-mapping rule (reference README.md:74-80; flag semantics
    main.py:211-223)."""

    source_field: str
    mixpanel_field: str
    type: str = "passthrough"
    is_required_in_source: bool = False
    include_if_none: bool = False

    def __post_init__(self) -> None:
        if not self.source_field:
            raise ConfigError("field_mapping.source_field must be non-empty")
        if not self.mixpanel_field:
            raise ConfigError("field_mapping.mixpanel_field must be non-empty")
        if self.type not in CAST_TYPES:
            raise ConfigError(
                f"field_mapping.type {self.type!r} not one of {sorted(CAST_TYPES)}"
            )

    @property
    def is_wildcard(self) -> bool:
        return self.source_field == WILDCARD

    @classmethod
    def from_dict(cls, d: dict) -> "FieldMapping":
        return cls(
            source_field=d.get("source_field", ""),
            mixpanel_field=d.get("mixpanel_field", ""),
            type=d.get("type", "passthrough"),
            is_required_in_source=bool(d.get("is_required_in_source", False)),
            include_if_none=bool(d.get("include_if_none", False)),
        )


@dataclass(frozen=True)
class SourceConfig:
    """One source config entry (reference sources.json:2-14).

    ``config_order`` preserves the position in the config file: first-match
    prefix routing is order-sensitive (reference main.py:48-59) and the
    order must survive into the routing join (SURVEY §7 hard part 7).
    """

    config_id: str
    source_gcs_prefix: str
    file_type: str = "PARQUET"
    mixpanel_event_name: str | None = None
    mixpanel_event_name_from_field: str | None = None
    field_mappings: tuple[FieldMapping, ...] = field(default_factory=tuple)
    config_order: int = 0

    def __post_init__(self) -> None:
        if not self.config_id:
            raise ConfigError("config_id must be non-empty")
        if not self.source_gcs_prefix:
            raise ConfigError(f"{self.config_id}: source_gcs_prefix must be non-empty")
        explicit = [m.source_field for m in self.field_mappings if not m.is_wildcard]
        dupes = {f for f in explicit if explicit.count(f) > 1}
        if dupes:
            raise ConfigError(f"{self.config_id}: duplicate source_field {dupes}")

    @property
    def wildcard(self) -> FieldMapping | None:
        for m in self.field_mappings:
            if m.is_wildcard:
                return m
        return None

    @property
    def explicit_mappings(self) -> tuple[FieldMapping, ...]:
        return tuple(m for m in self.field_mappings if not m.is_wildcard)

    @classmethod
    def from_dict(cls, d: dict, config_order: int = 0) -> "SourceConfig":
        return cls(
            config_id=d.get("config_id", ""),
            source_gcs_prefix=d.get("source_gcs_prefix", ""),
            file_type=d.get("file_type", "PARQUET"),
            mixpanel_event_name=d.get("mixpanel_event_name"),
            mixpanel_event_name_from_field=d.get("mixpanel_event_name_from_field"),
            field_mappings=tuple(
                FieldMapping.from_dict(m) for m in d.get("field_mappings", [])
            ),
            config_order=config_order,
        )


def fetch_config_text(uri: str, spark=None) -> str:
    """Driver-side fetch of a (tiny) config file by URI through the JVM
    Hadoop FileSystem — the reference's GCS download
    (gcs_utils.py:18-45 ``download_gcs_file_as_string``) generalized to
    any scheme whose connector is on the Spark classpath: ``gs://`` on a
    cluster with the GCS connector, ``file://``/``hdfs://`` anywhere.
    Configs are KB-sized; this is one driver-side read, never a job."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ConfigError(
            f"fetching {uri!r} needs an active SparkSession (its JVM "
            "Hadoop FileSystem does the read) — pass spark= or a fetcher="
        )
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(hconf)
    stream = fs.open(path)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, hconf, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def load_configs(
    source: str | list[dict], spark=None, fetcher=None
) -> list[SourceConfig]:
    """Load configs from a JSON file path, URI, JSON text, or parsed list.

    A ``scheme://`` source (``gs://…/sources.json``) is fetched driver-
    side via ``fetch_config_text`` (reference gcs_utils.py:18-45), or via
    ``fetcher(uri) -> str`` when injected (tests, custom clients).
    """
    if isinstance(source, str):
        # a URI starts with a scheme; JSON text starts with [/{/whitespace
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", source):
            text = (
                fetcher(source) if fetcher is not None
                else fetch_config_text(source, spark)
            )
            raw = json.loads(text)
        elif os.path.exists(source):
            with open(source, "r", encoding="utf-8") as f:
                raw = json.load(f)
        else:
            raw = json.loads(source)
    else:
        raw = source
    if isinstance(raw, dict):
        raw = [raw]
    if not isinstance(raw, list):
        raise ConfigError(f"config root must be a list, got {type(raw).__name__}")
    configs = [SourceConfig.from_dict(d, i) for i, d in enumerate(raw)]
    ids = [c.config_id for c in configs]
    dupes = {i for i in ids if ids.count(i) > 1}
    if dupes:
        raise ConfigError(f"duplicate config_id values: {dupes}")
    return configs
