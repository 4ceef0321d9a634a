#!/usr/bin/env python3
"""Build an adversarial edge-case dataset shaped like /root/testdata/sf*.

The synthetic fixtures are well-behaved (ASCII text, min length ~47,
no zero vectors), so cross-engine divergences on edge inputs stay latent
until someone feeds real data. This generator covers the classes that
have actually bitten: empty/whitespace text, multibyte (CJK, accents)
code points, runs of spaces, exact duplicates, 1-2-token docs, zero and
identical embedding vectors, tiny magnitudes.

Usage:
    python3 scripts/make_edge_testdata.py [outDir]   # default /tmp/edge_sf
    sbt "runMain graft.Verify <outDir> /tmp/verify_edge"
    python3 scripts/check_oracle.py <outDir> /tmp/verify_edge

Divergences this gate has caught (fixed; kept here as regression fuel):
  - DuckDB ascii() returns INT32; cp * 2097152 overflowed on CJK
    codepoints in the char-trigram packing oracle.
  - Zero-norm vectors: Spark 0/0 = NaN (compares GREATEST), DuckDB
    0/0 = NULL (fails >=) -> cosine thresholds/rankings diverged.
"""
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.001"


def main(dst: str) -> None:
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    # lineitem with ONE NULL-l_tax row appended (advice r8): pins the
    # unpivot null seam (Spark's Dataset.unpivot RETAINS null measures,
    # SQL UNPIVOT excludes them — q_unpivot filters explicitly) and
    # exercises n vs n_nonnull in q_profile + the MWU null-propagation
    # mask on a NULL (not just NaN) feature cell
    con.execute("create table li as select * from"
                f" read_parquet('{SRC}/lineitem.parquet')")
    con.execute("insert into li select * replace (cast(null as double)"
                " as l_tax) from li order by l_orderkey, l_linenumber limit 1")
    con.execute(f"copy li to '{dst}/lineitem.parquet' (format parquet)")
    docs = [
        (0, "", "en", "edge", 0),
        (1, " ", "en", "edge", 1),
        (2, "a", "en", "edge", 1),
        (3, "é", "fr", "edge", 1),
        (4, "中文 文本 测试 中文 文本", "zh", "edge", 12),
        (5, "double  space  here", "en", "edge", 19),
        (6, "trailing space ", "en", "edge", 15),
        (7, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
        (8, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
        (9, "the quick brown fox jumps over a lazy dog today", "en", "edge", 47),
        (10, "one two", "en", "edge", 7),
        (11, "x y z", "de", "edge", 5),
        (12, "naïve café résumé naïve café", "fr", "edge", 28),
        (13, "tab\tand newline", "en", "edge", 15),
        (97 * 1, "the quick brown fox eval benchmark text", "en", "eval", 39),
        (97 * 2, "completely different eval set entry two", "en", "eval", 39),
    ]
    con.execute("create table d(doc_id bigint, text varchar, lang varchar,"
                " source varchar, n_chars bigint)")
    con.executemany("insert into d values (?,?,?,?,?)", docs)
    con.execute(f"copy d to '{dst}/documents.parquet' (format parquet)")

    def vec(f):
        return [float(f(i)) for i in range(64)]

    rows = [
        (0, vec(lambda i: 0.0), 0),            # zero vector
        (1, vec(lambda i: 1.0), 0),
        (2, vec(lambda i: 1.0), 0),            # identical pair
        (3, vec(lambda i: -1.0), 0),           # opposite
        (4, vec(lambda i: 1e-8), 1),           # tiny magnitudes
        (50, vec(lambda i: (i % 3) - 1), 1),   # query row (50 % 50 == 0)
        (100, vec(lambda i: 0.5 if i < 32 else -0.5), 1),
    ]
    con.execute("create table e(vec_id bigint, embedding float[], label integer)")
    con.executemany("insert into e values (?,?,?)", rows)
    con.execute(f"copy e to '{dst}/embeddings.parquet' (format parquet)")

    # adversarial events (replaces the copied table): timestamp ties,
    # inactivity gaps exactly at/just-over the 1800 s session boundary,
    # sub-second boundary fractions, hour-bucket edges, a single-event
    # user, null/empty/non-JSON props, negative and zero values
    events = [
        # user 1: duplicate timestamps (window-order ties)
        (1, "2024-01-01 00:00:00", 1, "click", 1.5, '{"k": 7}'),
        (2, "2024-01-01 00:00:00", 1, "click", 2.5, '{"k": 0}'),
        (3, "2024-01-01 00:00:01", 1, "view", 0.0, "{}"),
        # user 2: gap 1800 s (same session), then +1800.5 s (floored 1800,
        # same session), then floored 1801 s (closes the session)
        (4, "2024-01-01 00:00:00", 2, "click", -5.5, None),
        (5, "2024-01-01 00:30:00", 2, "view", 123.25, '{"k": 42}'),
        (6, "2024-01-01 01:00:00.500000000", 2, "view", 1.0, "not json"),
        (7, "2024-01-01 01:30:01.500000000", 2, "purchase", 1000000.0, '{"k": 9}'),
        # user 3: single event
        (8, "2024-01-01 05:00:00", 3, "signup", -0.0, '{"k": 1}'),
        # user 4: hour-bucket boundary at nanosecond resolution
        (9, "2024-01-01 01:59:59.999999999", 4, "error", 2.0, "{}"),
        (10, "2024-01-01 02:00:00.000000000", 4, "error", 3.0, "{}"),
    ]
    # pyarrow, not duckdb: the table must carry the parquet
    # Timestamp(NANOS, isAdjustedToUTC=false) annotation the real
    # testdata has (duckdb's writer downgrades to micros, which flips
    # Spark's nanosAsLong read path into TIMESTAMP_NTZ)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "event_id": pa.array([e[0] for e in events], pa.int64()),
        "ts": pa.array(np.array([np.datetime64(e[1].replace(" ", "T"), "ns")
                                 for e in events]), pa.timestamp("ns")),
        "user_id": pa.array([e[2] for e in events], pa.int64()),
        "event_type": pa.array([e[3] for e in events], pa.string()),
        "value": pa.array([e[4] for e in events], pa.float64()),
        "props": pa.array([e[5] for e in events], pa.string()),
    })
    pq.write_table(tbl, f"{dst}/events.parquet")
    print(f"edge testdata written to {dst}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edge_sf"
    import os
    os.makedirs(out, exist_ok=True)
    main(out)
