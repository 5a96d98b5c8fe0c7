"""Build the golden-equivalent Database through the normal engine path.

Shared by ``tests/test_goldens.py`` (value conformance) and
``tools/replay.py`` (the evobench-style serving replay harness): the
reference's e2e corpus (``endToEndTests/test/queries``) determines a
golden-equivalent dataset, reconstructed by ``build_dataset.build_records``
and ingested via ``sources.ndjson.ingest_records``.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
from pathlib import Path

E2E = Path("/root/reference/endToEndTests/test")
DATASET = Path("/root/reference/testBaseData/exampleDataset")


def build_golden_db(spark):
    """Ingest the reconstructed golden dataset; returns a registered
    :class:`lapis_silo_spark.catalog.Database` (side tables persisted)."""
    from lapis_silo_spark.catalog import Database
    from lapis_silo_spark.sources.lineage import (
        build_lineage_closure,
        parse_lineage_definition_yaml,
    )
    from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records
    from lapis_silo_spark.sources.phylo import build_phylo_nodes, parse_newick

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from build_dataset import build_records  # noqa: PLC0415

    genomes = json.loads((DATASET / "reference_genomes.json").read_text())
    nuc = {e["name"]: e["sequence"].upper()
           for e in genomes["nucleotideSequences"]}
    aa = {e["name"]: e["sequence"].upper() for e in genomes["genes"]}

    config = TableConfig(
        name="default",
        primary_key="primary_key",
        metadata={
            "usherTree": "string",
            "date": "date",
            "unsorted_date": "date",
            "region": "string",
            "country": "string",
            "pango_lineage": "string",
            "division": "string",
            "age": "int",
            "qc_value": "float",
            "test_boolean_column": "boolean",
        },
        nuc_sequences=nuc,
        aa_sequences=aa,
    )

    def seq_payload(s, insertions):
        return {"sequence": s, "sequenceCompressed": None,
                "insertions": insertions, "offset": None}

    def to_ingest(rec: dict) -> dict:
        row = {k: v for k, v in rec.items() if not k.startswith("_")}
        for col in ("date", "unsorted_date"):
            if row.get(col) is not None:
                row[col] = dt.date.fromisoformat(row[col])
        for name in nuc:
            ins = [f"{p}:{v}" for p, vals in
                   rec["_nuc_ins"].get(name, {}).items() for v in vals]
            row[name] = seq_payload(rec["_seq"].get(name), ins)
            row[f"unaligned_{name}"] = rec["_unaligned"].get(name)
        for gene in aa:
            ins = [f"{p}:{v}" for p, vals in
                   rec["_aa_ins"].get(gene, {}).items() for v in vals]
            row[gene] = seq_payload(rec["_aa"].get(gene), ins)
        return row

    records = [to_ingest(r) for r in build_records()]
    df = spark.createDataFrame(records, schema=config.spark_schema())
    main, store = ingest_records(spark, df, config)
    main = main.persist()
    for side in (store.mutations, store.coverage, store.missing,
                 store.insertions):
        side.persist()

    parents, aliases = parse_lineage_definition_yaml(
        (DATASET / "lineage_definition.yaml").read_text()
    )
    closure = build_lineage_closure(spark, parents, aliases).persist()

    nodes = build_phylo_nodes(
        spark, parse_newick((DATASET / "phylogenetic_tree.nwk").read_text())
    ).persist()

    db = Database(spark)
    db.register_table("default", main, primary_key="primary_key")
    db.register_sequence_store("default", store)
    db.register_lineage("pango_lineage", closure)
    db.register_phylo_tree("usherTree", nodes)
    return db
