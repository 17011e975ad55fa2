#!/usr/bin/env python3
"""Generate the CPython uuid5 golden parquet for the x_uuid5 oracle.

DuckDB 1.0 has no sha1, so the RFC 4122 v5 digest itself cannot be
replayed in SQL. Instead this script (independent implementation:
CPython's uuid.uuid5) precomputes uid for every DISTINCT name string
`repo/path@commit` the FilesTable derivation can produce at the three
driver scale factors, and commits the (name, uid) map as a parquet
fixture. The oracle then JOINS the live files_all CTE to the golden on
the name key — the (repo, path, commit) rows stay derived from the
current sf dir at verify time, so a derivation drift or a missing name
surfaces as a row-count mismatch (red), never a silent pass.

Same pattern as the sqlite CPython oracle (tools/ + fixtures/ +
VALUES/ parquet fixture); regenerate only if FilesTable changes.
"""
import sys
import uuid

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# Mirrors graft.synth.FilesTable.cte name-relevant columns (repo, path,
# commit). Drift here cannot cause a false pass: the verify-time join is
# on the full name, so a drifted key simply fails to match.
NAME_SQL = """
WITH documents AS (SELECT * FROM read_parquet('{path}')),
files_base AS (
  SELECT
    CASE WHEN doc_id % 10 < 3 THEN 'bigorg/monorepo'
         ELSE 'org' || CAST(doc_id % 13 AS VARCHAR) || '/repo' || CAST(doc_id % 7 AS VARCHAR) END AS repo,
    CASE WHEN doc_id % 89 = 3 THEN 'bad path with space/doc_' || CAST(doc_id AS VARCHAR)
         ELSE 'src/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.' || lang END AS path,
    substr(md5('c' || CAST(doc_id AS VARCHAR)), 1, 12) AS "commit"
  FROM documents
)
SELECT DISTINCT repo || '/' || path || '@' || "commit" AS name FROM files_base
"""

NAMESPACE_URL = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")


def main(out: str) -> None:
    names = set()
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        for (name,) in duckdb.sql(NAME_SQL.format(path=path)).fetchall():
            names.add(name)
    ordered = sorted(names)
    tbl = pa.table({
        "name": ordered,
        "uid": [str(uuid.uuid5(NAMESPACE_URL, n)) for n in ordered],
    })
    pq.write_table(tbl, out)
    print(f"wrote {len(ordered)} names -> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "fixtures/src_oracle/uuid5_golden.parquet")
