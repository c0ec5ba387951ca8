"""J7 — gazetteer membership / geo-consistency joins.

Re-expresses `stanford-kbp/.../slotfilling/evaluate/WorldKnowledgePostProcessor.java:300-388`
(isValidCity / city-region-country consistency over `kbp_cities.tab` /
`kbp_code2country.tab`) as broadcast joins against a geo dimension:

* ``validate_city_slots`` — a CITY-typed fill must exist in the
  gazetteer (P-validity);
* ``check_geo_consistency`` — a city fill's mapped country must not
  contradict the entity's accepted country fill of the same relation
  family (birth / death / residence / headquarters).

The geo table is tiny — always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# relation family: city relation -> matching country relation
CITY_TO_COUNTRY_REL = {
    "per:city_of_birth": "per:country_of_birth",
    "per:city_of_death": "per:country_of_death",
    "per:cities_of_residence": "per:countries_of_residence",
    "org:city_of_headquarters": "org:country_of_headquarters",
}


def geo_cities_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus's city gazetteer: (city, country) derived
    from the nation dim (city = nation name sans spaces + 'ville') —
    the `kbp_cities.tab` analog."""
    from ..sources.tables import read_table

    nation = read_table(spark, sf_dir, "nation")
    return nation.select(
        F.concat(F.regexp_replace(F.col("n_name"), " ", ""), F.lit("ville")).alias("city"),
        F.col("n_name").alias("country"),
    )


def validate_city_slots(triples: DataFrame, geo_cities: DataFrame) -> DataFrame:
    """Drop CITY-typed fills absent from the gazetteer (isValidCity)."""
    known = F.broadcast(geo_cities.select(F.col("city").alias("_city")))
    cities = triples.filter(F.col("slot_ner") == "CITY").join(
        known, F.col("slot_value") == F.col("_city"), "left_semi"
    )
    return triples.filter(F.col("slot_ner") != "CITY").unionByName(cities)


def check_geo_consistency(triples: DataFrame, geo_cities: DataFrame) -> DataFrame:
    """Drop a city fill whose gazetteer country CONTRADICTS the entity's
    accepted country fill in the same relation family. Entities with no
    country fill (or cities outside the gazetteer) are left alone —
    the check is a consistency filter, not a validity filter."""
    fam = F.create_map(
        *[x for k, v in sorted(CITY_TO_COUNTRY_REL.items()) for x in (F.lit(k), F.lit(v))]
    )
    city_rows = triples.filter(
        F.col("relation").isin(*CITY_TO_COUNTRY_REL)
    ).withColumn("_country_rel", fam.getItem(F.col("relation")))
    mapped = city_rows.join(
        F.broadcast(geo_cities.select(F.col("city").alias("_city"), F.col("country").alias("_geo_country"))),
        F.col("slot_value") == F.col("_city"),
        "left",
    )
    country_fills = triples.filter(
        F.col("relation").isin(*set(CITY_TO_COUNTRY_REL.values()))
    ).select(
        F.col("entity_name").alias("_e"),
        F.col("entity_type").alias("_et"),
        F.col("relation").alias("_cr"),
        F.col("slot_value").alias("_accepted_country"),
    )
    checked = mapped.join(
        country_fills,
        (F.col("entity_name") == F.col("_e"))
        & (F.col("entity_type") == F.col("_et"))
        & (F.col("_country_rel") == F.col("_cr")),
        "left",
    )
    keep = (
        F.col("_geo_country").isNull()
        | F.col("_accepted_country").isNull()
        | (F.col("_geo_country") == F.col("_accepted_country"))
    )
    surviving_cities = (
        checked.groupBy(*triples.columns).agg(F.min(keep.cast("int")).alias("_ok"))
        .filter(F.col("_ok") == 1)
        .drop("_ok")
    )
    return triples.filter(~F.col("relation").isin(*CITY_TO_COUNTRY_REL)).unionByName(
        surviving_cities
    )
