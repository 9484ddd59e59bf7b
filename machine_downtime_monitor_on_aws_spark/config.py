"""Configuration models for the ingest pipeline.

Mirrors the reference's configuration item shapes
(``source/lambda/util/gql-schema-interfaces.ts:6-38``) and validation
rules (``source/lambda/filter-kinesis-stream/machine-data-parser.ts:151-196``,
``source/lambda/util/utility-functions.ts:4-23``) as plain Python
dataclasses. Configs are driver-side objects: they parameterize plan
construction (column names, timestamp formats, delimiters) and are
broadcast to executors only as literals inside Column expressions -
the Spark-idiomatic replacement for the reference's in-memory config
hashmaps (``machine-data-parser.ts:32-34``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigValidationError(ValueError):
    """Raised when a config row fails the reference's validation rules."""


def _non_blank(value: object) -> bool:
    # reference: utility-functions.ts:4-23 (objectHasRequiredProperties:
    # present, non-null, non-blank-after-trim)
    return isinstance(value, str) and value.strip() != ""


@dataclass(frozen=True)
class MessageFormat:
    """A message-format config (``gql-schema-interfaces.ts:11-19``).

    Key names are *data*: the envelope's JSON keys are configurable, so
    the parse plan is built per-format at plan-build time (F10 in
    SURVEY.md SS2.8). ``timestamp_format`` uses Spark/Java datetime
    pattern syntax (the reference uses moment.js strict patterns; we
    translate the shipped default
    ``YYYY-MM-DD HH:mm:ss.SSSSSSZZ`` ->
    ``yyyy-MM-dd HH:mm:ss.SSSSSSXXX``). moment's ZZ accepts both
    ``+00:00`` and ``+0000``; Java patterns are one-or-the-other, so a
    trailing XXX probes as (XXX, XX) - see
    :attr:`timestamp_format_variants`. The reference's own fixtures
    use the colon form (machine-data-parser.spec.ts:140-147).
    """

    id: str = "DEFAULT"
    alias_delimiter: str = "/"
    messages_key: str = "messages"
    alias_key: str = "name"
    quality_key: str = "quality"
    timestamp_key: str = "timestamp"
    value_key: str = "value"
    # default per solution-helper-construct.ts:141-149, translated to
    # Java time pattern (XX = +0000-style offset).
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSSXXX"

    @property
    def timestamp_format_variants(self) -> tuple[str, ...]:
        """Java patterns the probe cascade tries, in order.

        moment's ``ZZ`` (the shipped default's offset token,
        solution-helper-construct.ts:146) accepts BOTH ``+00:00`` and
        ``+0000``; Java offset patterns are one-or-the-other (XXX =
        colon form, XX = basic form). A trailing XXX therefore expands
        to (XXX, XX) so both wire shapes parse, matching moment -
        pinned by the reference-fixture golden
        (machine-data-parser.spec.ts:144 -> epoch 1614968170)."""
        if self.timestamp_format.endswith("XXX"):
            return (self.timestamp_format, self.timestamp_format[:-3] + "XX")
        return (self.timestamp_format,)

    def validate(self) -> "MessageFormat":
        # machine-data-parser.ts:151-170: all seven fields non-blank
        required = {
            "alias_delimiter": self.alias_delimiter,
            "messages_key": self.messages_key,
            "alias_key": self.alias_key,
            "quality_key": self.quality_key,
            "timestamp_key": self.timestamp_key,
            "value_key": self.value_key,
            "timestamp_format": self.timestamp_format,
        }
        missing = [k for k, v in required.items() if not _non_blank(v)]
        if missing:
            raise ConfigValidationError(
                f"MessageFormat {self.id!r}: blank/missing fields {missing}"
            )
        return self


def split_csv_values(csv: str | None) -> list[str]:
    """CSV status-value list -> trimmed elements.

    reference: machine-data-parser.ts:86-97 (``split(',').map(trim)``);
    blank elements are kept as empty strings there, but membership of a
    blank value never matches because message values are non-blank by
    P1 validation - we drop them for cleanliness.
    """
    if csv is None:
        return []
    return [v.strip() for v in csv.split(",") if v.strip() != ""]


@dataclass(frozen=True)
class MachineConfig:
    """Per-machine classification config (``gql-schema-interfaces.ts:26-32``).

    ``status_tag`` / ``production_count_tag`` name the tag (last alias
    token) that carries the machine's status / production count.
    Status value lists are comma-separated strings, matched as strings
    after trim (``machine-data-parser.ts:86-97``).
    """

    id: str
    status_tag: str | None = None
    production_count_tag: str | None = None
    status_up_values: str | None = None
    status_down_values: str | None = None
    status_idle_values: str | None = None

    @property
    def up_values(self) -> list[str]:
        return split_csv_values(self.status_up_values)

    @property
    def down_values(self) -> list[str]:
        return split_csv_values(self.status_down_values)

    @property
    def idle_values(self) -> list[str]:
        return split_csv_values(self.status_idle_values)

    def validate(self) -> "MachineConfig":
        # machine-data-parser.ts:172-196: a config naming a status tag
        # must define at least one of up/down/idle value lists.
        if _non_blank(self.status_tag) and not (
            self.up_values or self.down_values or self.idle_values
        ):
            raise ConfigValidationError(
                f"MachineConfig {self.id!r}: status_tag set but no "
                "up/down/idle values configured"
            )
        return self


@dataclass(frozen=True)
class UIReferenceMapping:
    """Token-position mapping for deriving location/line from machine id.

    reference: ``gql-schema-interfaces.ts:21-24``; defaults '0/1' and
    '2' per ``solution-helper-construct.ts:150-153``. Keys are
    '/'-separated 0-based token indexes into the machine id split on
    the alias delimiter (``configuration.py:205-220``).
    """

    location_keys: str = "0/1"
    line_keys: str = "2"

    def location_indexes(self) -> list[int]:
        return [int(k) for k in self.location_keys.split("/") if k != ""]

    def line_indexes(self) -> list[int]:
        return [int(k) for k in self.line_keys.split("/") if k != ""]


# Canonical machine-status enum (util/data-models.ts:28-33)
STATUS_UP = "UP"
STATUS_DOWN = "DOWN"
STATUS_IDLE = "IDLE"
STATUS_UNKNOWN = "UNKNOWN"
MACHINE_STATUSES = (STATUS_UP, STATUS_DOWN, STATUS_IDLE, STATUS_UNKNOWN)

# Real-time message types (util/data-models.ts:35-38)
MSG_TYPE_STATUS = "STATUS"
MSG_TYPE_PRODUCTION_COUNT = "PRODUCTION_COUNT"


@dataclass(frozen=True)
class IngestConfig:
    """Everything the ingest plan needs, bundled.

    ``formats`` is the probe list (first match wins, P1); ``machines``
    maps machine_id -> MachineConfig (J1's broadcast side);
    ``retention_hours`` drives the TTL predicate (P11, default 24 per
    ``real-time-processing-construct.ts:66``).
    """

    formats: tuple[MessageFormat, ...] = (MessageFormat(),)
    machines: tuple[MachineConfig, ...] = ()
    mapping: UIReferenceMapping = field(default_factory=UIReferenceMapping)
    retention_hours: int = 24

    def validate(self) -> "IngestConfig":
        if self.retention_hours < 24:
            # filter-kinesis-stream/index.ts:113-130: expiration must be
            # an integer >= 24 hours.
            raise ConfigValidationError("retention_hours must be >= 24")
        for f in self.formats:
            f.validate()
        for m in self.machines:
            m.validate()
        return self
