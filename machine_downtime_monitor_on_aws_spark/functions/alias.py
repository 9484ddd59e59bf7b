"""Alias decomposition and id-token projection (F1/D3/P2).

The reference splits a tag alias ``site/area/process/machine/TAG`` on
a configurable delimiter: the last token is the tag (attribute) name,
the prefix re-joined is the machine id
(``source/lambda/filter-kinesis-stream/machine-data-parser.ts:62-68``;
same logic in ``glue-job-scripts/convert_parquet.py:121-128`` and the
client ``web-ui/src/views/machines/Overview.tsx:222-239``).

Location/line ids are built from configured token positions of the
machine id (``glue-job-scripts/configuration.py:205-220``; defaults
'0/1' and '2', ``solution-helper-construct.ts:150-153``).

All pure built-ins (split/slice/array_join/element_at) - JVM-side,
codegen'd, no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_alias(alias: Column, delimiter: str) -> Column:
    """Tokenize on the literal delimiter (F.split takes a regex -
    escape it)."""
    return F.split(alias, re.escape(delimiter))


def alias_tag(alias: Column, delimiter: str) -> Column:
    """Last token = tag/attribute name (machine-data-parser.ts:64)."""
    return F.element_at(split_alias(alias, delimiter), -1)


def alias_machine_id(alias: Column, delimiter: str) -> Column:
    """All-but-last tokens re-joined = machine id
    (machine-data-parser.ts:65-68)."""
    toks = split_alias(alias, delimiter)
    return F.array_join(F.slice(toks, 1, F.size(toks) - 1), delimiter)


def alias_token_count(alias: Column, delimiter: str) -> Column:
    return F.size(split_alias(alias, delimiter))


def id_tokens_at(
    id_col: Column, delimiter: str, indexes: list[int]
) -> Column:
    """Join the id's tokens at 0-based ``indexes`` with the delimiter
    (configuration.py:205-220 ``build_location_line``). Out-of-range
    indexes contribute NULL tokens which array_join skips."""
    toks = split_alias(id_col, delimiter)
    picked = F.array(*[F.element_at(toks, i + 1) for i in indexes])
    return F.array_join(picked, delimiter)
