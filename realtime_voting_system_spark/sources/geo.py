"""Geo layer (SURVEY §2.1 S6, §2.3 J6).

The reference loads a US-states GeoJSON with geopandas (app.py:563) and
left-merges vote counts onto it by state name (app.py:567-572,590-595) to
paint the choropleth. The engine-side equivalent is a static states
dimension + left join; polygon geometry stays presentation-side (the
dashboard's concern), so the lookup carries name/abbr/census-region —
enough to reproduce the join semantics and the per-region rollup.

Scale: 50 rows — always broadcast; the join adds zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# name, USPS abbreviation, census region — public reference data.
_STATES: list[tuple[str, str, str]] = [
    ("Alabama", "AL", "South"), ("Alaska", "AK", "West"),
    ("Arizona", "AZ", "West"), ("Arkansas", "AR", "South"),
    ("California", "CA", "West"), ("Colorado", "CO", "West"),
    ("Connecticut", "CT", "Northeast"), ("Delaware", "DE", "South"),
    ("Florida", "FL", "South"), ("Georgia", "GA", "South"),
    ("Hawaii", "HI", "West"), ("Idaho", "ID", "West"),
    ("Illinois", "IL", "Midwest"), ("Indiana", "IN", "Midwest"),
    ("Iowa", "IA", "Midwest"), ("Kansas", "KS", "Midwest"),
    ("Kentucky", "KY", "South"), ("Louisiana", "LA", "South"),
    ("Maine", "ME", "Northeast"), ("Maryland", "MD", "South"),
    ("Massachusetts", "MA", "Northeast"), ("Michigan", "MI", "Midwest"),
    ("Minnesota", "MN", "Midwest"), ("Mississippi", "MS", "South"),
    ("Missouri", "MO", "Midwest"), ("Montana", "MT", "West"),
    ("Nebraska", "NE", "Midwest"), ("Nevada", "NV", "West"),
    ("New-Hampshire", "NH", "Northeast"), ("New-Jersey", "NJ", "Northeast"),
    ("New-Mexico", "NM", "West"), ("New-York", "NY", "Northeast"),
    ("North-Carolina", "NC", "South"), ("North-Dakota", "ND", "Midwest"),
    ("Ohio", "OH", "Midwest"), ("Oklahoma", "OK", "South"),
    ("Oregon", "OR", "West"), ("Pennsylvania", "PA", "Northeast"),
    ("Rhode-Island", "RI", "Northeast"), ("South-Carolina", "SC", "South"),
    ("South-Dakota", "SD", "Midwest"), ("Tennessee", "TN", "South"),
    ("Texas", "TX", "South"), ("Utah", "UT", "West"),
    ("Vermont", "VT", "Northeast"), ("Virginia", "VA", "South"),
    ("Washington", "WA", "West"), ("West-Virginia", "WV", "South"),
    ("Wisconsin", "WI", "Midwest"), ("Wyoming", "WY", "West"),
]

STATES_SCHEMA = StructType(
    [
        StructField("state_name", StringType(), False),
        StructField("state_abbr", StringType(), False),
        StructField("census_region", StringType(), False),
    ]
)


def us_states(spark: SparkSession) -> DataFrame:
    """The states dimension (stand-in for the GeoJSON's feature table)."""
    return spark.createDataFrame(_STATES, STATES_SCHEMA)


def us_states_indexed(spark: SparkSession) -> DataFrame:
    """States dimension with a stable 0-based index (list order) — the key
    for deterministic fact→state mapping on testdata (user_id mod 50)."""
    return spark.createDataFrame(
        [(i, *t) for i, t in enumerate(_STATES)],
        "sidx long, state_name string, state_abbr string, census_region string",
    )


def merge_votes_geo(
    states: DataFrame,
    votes_by_state: DataFrame,
    state_col: str = "address_state",
    fill_zero: tuple[str, ...] = ("vote_count",),
) -> DataFrame:
    """J6: geo LEFT JOIN fact-aggregate on state name — every state row
    survives (un-voted states paint as zero, exactly the dashboard's
    ``how='left'`` merge + fillna path, app.py:567-572)."""
    out = states.join(
        votes_by_state,
        states["state_name"] == votes_by_state[state_col],
        "left",
    ).drop(state_col)
    return out.na.fill(0, list(fill_zero))


def load_geojson_features(
    spark: SparkSession, path: str, feature_fields: dict[str, str]
) -> DataFrame:
    """S6 proper: read a GeoJSON FeatureCollection (multiLine JSON) and
    project feature properties into columns; geometry is carried as its
    raw JSON string (presentation layers parse it, the engine treats it
    as opaque — same stance as multimodal binary columns)."""
    raw = spark.read.option("multiLine", True).json(path)
    feat = raw.select(F.explode("features").alias("f"))
    cols = [
        F.col(f"f.properties.{src}").alias(dst)
        for dst, src in feature_fields.items()
    ]
    return feat.select(*cols, F.to_json(F.col("f.geometry")).alias("geometry_json"))
