"""Shared fixtures: one SparkSession per test session + a genomic example
dataset mirroring the reference's QUERY_TEST fixture pattern
(``/root/reference/src/silo/test/query_fixture.test.h:22-128``): tiny inline
records with known sequences, a lineage tree with a recombinant, and a phylo
tree — every expected result hand-computable.
"""

from __future__ import annotations

import datetime as dt

import pytest

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.session import get_spark
from lapis_silo_spark.sources.lineage import build_lineage_closure
from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records
from lapis_silo_spark.sources.phylo import build_phylo_nodes, parse_newick

REF_MAIN = "ACGTACGTAC"  # positions 1..10
REF_S = "MSKLV*"  # amino-acid gene, positions 1..6


def seq(s, insertions=None, offset=None):
    return {
        "sequence": s,
        "sequenceCompressed": None,
        "insertions": insertions or [],
        "offset": offset,
    }


RECORDS = [
    {
        "primary_key": "k1",
        "country": "Switzerland",
        "age": 30,
        "date": dt.date(2021, 1, 1),
        "pango_lineage": "B.1",
        "usherTree": "L1",
        "main": seq(REF_MAIN, insertions=["5:CCC"]),
        "S": seq(REF_S),
    },
    {
        "primary_key": "k2",
        "country": "Switzerland",
        "age": None,
        "date": dt.date(2021, 2, 1),
        "pango_lineage": "B.1.1.7",
        "usherTree": "L2",
        # mutation pos3 G->T, interior missing pos5
        "main": seq("ACTTNCGTAC", insertions=["5:CGG"]),
        # interior missing X at pos3
        "S": seq("MSXLV*"),
    },
    {
        "primary_key": "k3",
        "country": "Germany",
        "age": 55,
        "date": dt.date(2021, 3, 1),
        "pango_lineage": "XBB",
        "usherTree": "L3",
        # covered [3,8): ambiguity R at pos5 (ref A)
        "main": seq("NNGTRCGNNN", insertions=["0:TAT"]),
        # mutation pos3 K->A
        "S": seq("MSALV*"),
    },
    {
        "primary_key": "k4",
        "country": "Germany",
        "age": 20,
        "date": None,
        "pango_lineage": None,
        "usherTree": "NOT_IN_TREE",
        "main": None,
        "S": None,
    },
]

LINEAGE_PARENTS = {
    "B": [],
    "B.1": ["B"],
    "B.1.1": ["B.1"],
    "B.1.1.7": ["B.1.1"],
    "B.1.617.2": ["B.1"],
    "AY.43": ["B.1.617.2"],
    "B.1.177": ["B.1"],
    "XBB": ["B.1.1.7", "B.1.177"],  # recombinant
}

NEWICK = "((L1:0.1,L2:0.2)A:0.3,(L3:0.4)B:0.5)ROOT;"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="lapis-silo-spark-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def example_db(spark) -> Database:
    config = TableConfig(
        name="default",
        primary_key="primary_key",
        metadata={
            "country": "string",
            "age": "int",
            "date": "date",
            "pango_lineage": "string",
            "usherTree": "string",
        },
        nuc_sequences={"main": REF_MAIN},
        aa_sequences={"S": REF_S},
    )
    records = spark.createDataFrame(RECORDS, schema=config.spark_schema())
    main, store = ingest_records(spark, records, config)

    db = Database(spark)
    db.register_table("default", main, primary_key="primary_key")
    db.register_sequence_store("default", store)
    db.register_lineage(
        "pango_lineage", build_lineage_closure(spark, LINEAGE_PARENTS)
    )
    db.register_phylo_tree(
        "usherTree", build_phylo_nodes(spark, parse_newick(NEWICK))
    )
    return db


def pks(pipeline) -> set[str]:
    return {r["primary_key"] for r in pipeline.df.select("primary_key").collect()}
