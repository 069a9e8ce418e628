"""Hash-green connected-components ORACLE point at tier scale (round-15,
carrying r13 verdict ask #1 / r14 ask #7).

q59/q140's DuckDB oracle is a recursive transitive-closure CTE that is
quadratic in component size — on the replicated bench tiers (80k docs,
unbounded component structure) it fills DuckDB's temp cap, so those tiers
record Spark rows-only.  This module builds the BOUNDED fixture the verdict
asked for: 16,000 documents (3.2x the sf0.1 corpus, 32x the corpus the
standard oracle suite checks) whose near-dup clusters are small by
construction (chains of <=4 members, ~150-char texts), so the closure stays
linear and DuckDB completes — giving one EXACT (row+schema+value) CC parity
point at a scale the small-SF suite never reaches.

The fixture is deterministic (seeded), built once per module into a tmp
dir, and exercises real CC structure: chain clusters (A~B~C~D where A and D
only connect transitively) so label propagation must actually iterate.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from coldata_spark import registry
from tests.oracle_utils import compare

N_CLUSTERS = 4000
CHAIN = 4  # docs per cluster, chained near-dups


@pytest.fixture(scope="module")
def cc_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("cc_tier")
    rng = random.Random(42)
    # a LARGE vocabulary keeps clusters shingle-disjoint: a first draft
    # with 20 fixed words made unrelated clusters share most of their
    # 5-char shingles, welding them into mega-components whose chains
    # exceeded the CC engine's max_iters — exactly the unbounded structure
    # this fixture exists to avoid
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 9)))
        for _ in range(5000)
    ]
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    did = 0
    for c in range(N_CLUSTERS):
        # a cluster base text of ~20 words; each chain member mutates the
        # PREVIOUS member's tail by one word, so adjacent members are
        # near-dups (high shingle jaccard) while the chain ends are only
        # transitively connected
        base = [rng.choice(words) for _ in range(20)]
        cur = list(base)
        for m in range(CHAIN):
            if m:
                cur = list(cur)
                cur[-(1 + (m % 3))] = rng.choice(words)
            text = " ".join(cur)
            doc_ids.append(did)
            texts.append(text)
            langs.append("en")
            sources.append(f"src_{c % 7}")
            n_chars.append(len(text))
            did += 1
    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(out), "documents.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name", ["q59_dedup_groups", "q140_cluster_aware_split"]
)
def test_cc_oracle_parity_at_tier_scale(spark, cc_dir, name):
    spec = registry.specs()[name]
    sdf = spec.fn(spark, cc_dir)
    # only the documents view: the fixture is documents-only, and
    # duck_connection's CREATE VIEW binds (and so requires) every table
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{cc_dir}/documents.parquet')"
    )
    try:
        oracle = con.execute(spec.sql).df()
    finally:
        con.close()
    problems = compare(sdf, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
