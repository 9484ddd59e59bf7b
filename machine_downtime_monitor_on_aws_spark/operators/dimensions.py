"""BI dimension export + downtime dataset (SURVEY.md SS3.3 steps 1+4).

The reference's nightly ``configuration.py`` scans the config tables
and hand-builds two CSVs; QuickSight then joins them with the Athena
duration rows (``create-quicksight.ts:151-189``). Here both
dimensions are DataFrames and the dataset is a pair of broadcast
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import UIReferenceMapping
from ..functions.alias import id_tokens_at


def machine_information(
    ui_reference: DataFrame, mapping: UIReferenceMapping, delimiter: str = "/"
) -> DataFrame:
    """``machine_information(id, machine_name, location, line)``.

    reference: glue-job-scripts/configuration.py:245-283 (header
    :247); location/line derived from id tokens at configured
    positions (D3, configuration.py:205-220); display name defaults
    to the id (F12, configuration.py:259).
    """
    machines = ui_reference.filter(F.col("type") == "MACHINE")  # P6
    return machines.select(
        F.col("id"),
        F.coalesce(F.col("name"), F.col("id")).alias("machine_name"),
        id_tokens_at(F.col("id"), delimiter, mapping.location_indexes()).alias("location"),
        id_tokens_at(F.col("id"), delimiter, mapping.line_indexes()).alias("line"),
    )


def machine_config_information(machine_config: DataFrame) -> DataFrame:
    """``machine_config_information(id, status_tag, down_value)`` -
    one row PER down value (CSV exploded, configuration.py:291-294).

    The explosion is what lets the downtime join double as the
    DOWN-filter (J5): durations join on value = down_value.
    """
    cfgs = machine_config.filter(
        F.col("status_tag").isNotNull() & F.col("status_down_values").isNotNull()
    )
    down = F.explode(
        F.filter(
            F.transform(F.split(F.col("status_down_values"), ","), lambda v: F.trim(v)),
            lambda v: v != "",
        )
    ).alias("down_value")
    return cfgs.select(F.col("id"), F.col("status_tag"), down)


def downtime_dataset(
    durations: DataFrame,
    config_info: DataFrame,
    machine_info: DataFrame,
) -> DataFrame:
    """J5: durations ⋈ config (id, tag=status_tag, value=down_value) ⋈
    machine_information (id). The first join IS the DOWN filter - a
    duration row survives only if its value is one of the machine's
    configured down values (create-quicksight.ts:151-189).

    Dimensions are tiny -> both joins broadcast; the durations side
    (the 100 TB fact) never shuffles.
    """
    j1 = durations.join(
        F.broadcast(config_info),
        (durations["id"] == config_info["id"])
        & (durations["tag"] == config_info["status_tag"])
        & (durations["value"] == config_info["down_value"]),
        "inner",
    ).drop(config_info["id"])
    return j1.join(F.broadcast(machine_info), "id", "inner")


def display_order(df: DataFrame, name_col: str = "name", id_col: str = "id") -> DataFrame:
    """O2 (Overview.tsx:286-292): display sort by name-or-id.

    The reference uses localeCompare; engine-side we sort by the
    binary collation of coalesce(name, id) - deterministic and
    locale-independent (UI layers may re-sort with ICU if needed).
    """
    return df.orderBy(F.coalesce(F.col(name_col), F.col(id_col)))


def write_dimension_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S10 (configuration.py:245-308): dimension export as a single
    CSV part. coalesce(1) is correct ONLY for dimension-sized tables
    (the reference writes these for QuickSight manifests); facts go
    through the parquet lake."""
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(path)


def write_dimension_manifest(
    spark,
    csv_path: str,
    manifest_path: str,
    delimiter: str = ",",
    text_qualifier: str = "'",
    contains_header: bool = True,
) -> dict:
    """S10 tail (configuration.py:184-202, 296-308): BI-tool manifest
    JSON naming the exported CSV part files.

    The reference hardcodes one s3:// URI per export; here the part
    files are enumerated through the Hadoop FileSystem API so the
    manifest is correct on any supported filesystem (file://, s3a://,
    hdfs://) and stays correct if an export ever has >1 part. Returns
    the manifest dict (also written as JSON to ``manifest_path``).
    """
    import json

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(csv_path)
    fs = src.getFileSystem(hconf)
    uris = []
    for st in fs.listStatus(src):
        name = st.getPath().getName()
        if name.startswith("part-"):
            uris.append(st.getPath().toUri().toString())
    manifest = {
        "fileLocations": [{"URIs": sorted(uris)}],
        "globalUploadSettings": {
            "format": "CSV",
            "delimiter": delimiter,
            "textqualifier": text_qualifier,
            "containsHeader": "true" if contains_header else "false",
        },
    }
    dst = jvm.org.apache.hadoop.fs.Path(manifest_path)
    out = dst.getFileSystem(hconf).create(dst, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=2).encode("utf-8")))
    finally:
        out.close()
    return manifest
