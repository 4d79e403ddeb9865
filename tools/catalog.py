#!/usr/bin/env python3
"""Regenerate the README §5 query catalog from the module defs lists.

Parses each module's `QueryDef("name", ...)` occurrences in source order
(the same order SparkEntry.allDefs concatenates), labels rows by module,
and marks the oracle kind (DuckDB hash vs rows-only for the two
contract-sanctioned entries). Prints the markdown table to stdout.

Dev tool only — never shipped in the Scala library.
"""
import re
import sys
from pathlib import Path

MODULES = [
    ("src/main/scala/graft/operators/RelationalQueries.scala", "Relational 1"),
    ("src/main/scala/graft/operators/RelationalQueries2.scala", "Relational 2"),
    ("src/main/scala/graft/operators/AsofAndSketch.scala", "As-of & sketch"),
    ("src/main/scala/graft/operators/JoinsAndSetOps.scala", "Joins & set ops"),
    ("src/main/scala/graft/operators/SessionAndSkew.scala", "Sessions & skew"),
    ("src/main/scala/graft/operators/SweepSkyline.scala", "Sweep & skyline"),
    ("src/main/scala/graft/operators/GraphOps.scala", "Graph"),
    ("src/main/scala/graft/sources/Sinks.scala", "Sinks"),
    ("src/main/scala/graft/operators/SchemerQueries.scala", "Schema inference"),
    ("src/main/scala/graft/operators/TextQueries.scala", "Text analysis"),
    ("src/main/scala/graft/operators/CurationPipeline.scala", "Curation pipeline"),
    ("src/main/scala/graft/operators/TrainingOps.scala", "Training ops"),
    ("src/main/scala/graft/dedup/Dedup.scala", "Deduplication"),
    ("src/main/scala/graft/similarity/Ann.scala", "Similarity search"),
    ("src/main/scala/graft/multimodal/Media.scala", "Multimodal"),
    ("src/main/scala/graft/streaming/EventStreams.scala", "Streaming"),
]

ROWS_ONLY = {"schema_events_full", "sketch_stats"}


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(".")
    i = 0
    print("| # | Query | Module | Oracle |")
    print("|---|---|---|---|")
    names = []
    for path, label in MODULES:
        src = (root / path).read_text()
        defs = src[src.index("val defs"):]
        for m in re.finditer(r'QueryDef\(\s*"([a-z0-9_]+)"', defs):
            i += 1
            name = m.group(1)
            names.append(name)
            oracle = "rows-only (sanctioned)" if name in ROWS_ONLY else "DuckDB hash"
            print(f"| {i} | `{name}` | {label} | {oracle} |")
    n_oracled = len(names) - len(ROWS_ONLY & set(names))
    print()
    print(f"{len(names)} queries, {n_oracled} with DuckDB oracles")
    assert len(set(names)) == len(names), "duplicate query names"


if __name__ == "__main__":
    main()
