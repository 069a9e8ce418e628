"""Property-based tests (hypothesis) for expression-level text/vector
operators against independent Python reference implementations
(SURVEY §5.4)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=400,
)


@st.composite
def text_batches(draw):
    return draw(st.lists(texts, min_size=1, max_size=8))


class TestChunkGeometry:
    """n_chunks/chunk_starts formula vs a direct Python reference."""

    @staticmethod
    def ref_n_chunks(length: int, size: int = 128, stride: int = 64) -> int:
        return 1 + max(0, math.ceil((length - size) / stride))

    @given(st.integers(min_value=0, max_value=10_000))
    def test_chunks_cover_text_exactly(self, length):
        n = self.ref_n_chunks(length)
        starts = [i * 64 for i in range(n)]
        # coverage: last chunk reaches the end for any non-empty text
        if length > 0:
            assert starts[-1] + 128 >= length
        # no fully-redundant trailing chunk (its start is inside the text,
        # or it is the only chunk)
        if n > 1:
            assert starts[-1] < length

    @given(st.integers(min_value=1, max_value=10_000))
    def test_overlap_is_half(self, length):
        n = self.ref_n_chunks(length)
        if n > 1:
            # consecutive chunks overlap by exactly size - stride = 64
            assert (64 * 1 + 128) - (64 * 2) == 64


def spark_batch_eval(spark, fn_col, values: list[str]) -> list:
    """Evaluate a Column-builder over literal rows."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], ["t"])
    return [r.out for r in df.select(fn_col(F.col("t")).alias("out")).collect()]


class TestTokenCount:
    @staticmethod
    def ref(s: str) -> int:
        return len(s.split())

    @settings(max_examples=20, deadline=None)
    @given(text_batches())
    def test_matches_python_split(self, spark, batch):
        from coldata_spark.functions.text import token_count

        got = spark_batch_eval(spark, token_count, batch)
        assert got == [self.ref(s) for s in batch]


class TestCleanText:
    @staticmethod
    def ref(s: str) -> str:
        s = re.sub(r"[^\x20-\x7E]", " ", s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=8))
    def test_matches_python_regex(self, spark, batch):
        from coldata_spark.functions.text import clean_text

        got = spark_batch_eval(spark, clean_text, batch)
        assert got == [self.ref(s) for s in batch]


class TestCosine:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=16,
        )
    )
    def test_self_similarity_is_one(self, spark, vec):
        import numpy as np

        if np.linalg.norm(vec) < 1e-3:
            return
        from pyspark.sql import functions as F

        from coldata_spark.functions import vector as V

        df = spark.createDataFrame([(vec, vec)], ["a", "b"])
        got = df.select(
            V.cosine(V.as_double(F.col("a")), V.as_double(F.col("b"))).alias("c")
        ).collect()[0].c
        assert abs(got - 1.0) < 1e-9

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=8,
        ),
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=8,
        ),
    )
    def test_symmetry(self, spark, a, b):
        import numpy as np

        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        if np.linalg.norm(a) < 1e-3 or np.linalg.norm(b) < 1e-3:
            return
        from pyspark.sql import functions as F

        from coldata_spark.functions import vector as V

        df = spark.createDataFrame([(a, b)], ["a", "b"])
        row = df.select(
            V.cosine(V.as_double(F.col("a")), V.as_double(F.col("b"))).alias("ab"),
            V.cosine(V.as_double(F.col("b")), V.as_double(F.col("a"))).alias("ba"),
        ).collect()[0]
        assert abs(row.ab - row.ba) < 1e-12
        assert -1.0 - 1e-9 <= row.ab <= 1.0 + 1e-9


class TestMergeUpsertModel:
    """merge_upsert vs a dict-semantics reference model: the merged table
    is exactly {**existing, **updates} keyed by pk (one update row per pk)."""

    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-1000, max_value=1000),
            max_size=12,
        ),
        st.dictionaries(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-1000, max_value=1000),
            max_size=12,
        ),
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_dict_semantics(self, existing_d, updates_d):
        from coldata_spark.operators.upsert import merge_upsert
        from coldata_spark.session import get_spark

        spark = get_spark(app_name="coldata_spark_tests", shuffle_partitions=8)
        if not existing_d and not updates_d:
            return
        mk = lambda d: spark.createDataFrame(
            [(k, v) for k, v in d.items()], "pk bigint, val bigint"
        )
        want = {**existing_d, **updates_d}
        if not existing_d:
            got_df = mk(updates_d)  # merge needs a non-empty existing side
            want = dict(updates_d)
        elif not updates_d:
            got_df = mk(existing_d)
        else:
            got_df = merge_upsert(mk(existing_d), mk(updates_d), pk="pk")
        got = {r["pk"]: r["val"] for r in got_df.collect()}
        assert got == want


class TestUrlCanonicalize:
    """canonicalize_url vs an independent Python re-implementation, plus the
    canonicalization laws: idempotence and variant-insensitivity."""

    TRACKING = re.compile(r"^(utm_|fbclid=|gclid=|ref=)")

    @classmethod
    def ref(cls, url: str) -> str:
        m_scheme = re.match(r"^([A-Za-z]+)://", url)
        scheme = (m_scheme.group(1) if m_scheme else "").lower()
        m_host = re.match(r"^[A-Za-z]+://([^/?#]+)", url)
        host = (m_host.group(1) if m_host else "").lower()
        # scheme-aware default-port strip (round-4 fix: :443 on http is a
        # DIFFERENT origin and must survive canonicalization)
        if scheme == "http":
            host = re.sub(r":80$", "", host)
        elif scheme == "https":
            host = re.sub(r":443$", "", host)
        m_path = re.match(r"^[A-Za-z]+://[^/?#]+([^?#]*)", url)
        path = re.sub(r"/+$", "", m_path.group(1) if m_path else "") or "/"
        m_qs = re.search(r"\?([^#]*)", url)
        qs = m_qs.group(1) if m_qs else ""
        params = sorted(
            p for p in qs.split("&") if p != "" and not cls.TRACKING.match(p)
        )
        query = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}{path}{query}"

    @st.composite
    @staticmethod
    def messy_urls(draw):
        scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTtPs"]))
        word = st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=8,
        )
        host = ".".join(draw(st.lists(word, min_size=1, max_size=3)))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        path = "".join("/" + draw(word) for _ in range(draw(st.integers(0, 3))))
        slash = draw(st.sampled_from(["", "/"]))
        keys = st.sampled_from(["id", "page", "q", "utm_source", "utm_campaign", "ref"])
        params = [
            f"{draw(keys)}={draw(word)}" for _ in range(draw(st.integers(0, 4)))
        ]
        qs = "?" + "&".join(params) if params else ""
        frag = draw(st.sampled_from(["", "#top", "#sec-2"]))
        return f"{scheme}://{host}{port}{path}{slash}{qs}{frag}"

    @settings(max_examples=15, deadline=None)
    @given(st.lists(messy_urls(), min_size=1, max_size=20))
    def test_matches_python_reference(self, spark, batch):
        from coldata_spark.functions.url import canonicalize_url

        got = spark_batch_eval(spark, canonicalize_url, batch)
        assert got == [self.ref(u) for u in batch]

    @settings(max_examples=15, deadline=None)
    @given(st.lists(messy_urls(), min_size=1, max_size=20))
    def test_idempotent(self, spark, batch):
        from coldata_spark.functions.url import canonicalize_url

        once = spark_batch_eval(spark, canonicalize_url, batch)
        twice = spark_batch_eval(spark, canonicalize_url, once)
        assert twice == once

    @settings(max_examples=15, deadline=None)
    @given(messy_urls())
    def test_variants_collapse(self, spark, url):
        """Adding a fragment, default port, or tracking param never changes
        the canonical form."""
        from coldata_spark.functions.url import canonicalize_url

        base = re.sub(r"#.*$", "", url)
        has_qs = "?" in base
        variants = [
            base + "#anywhere",
            base + ("&" if has_qs else "?") + "utm_source=news",
            base + ("&" if has_qs else "?") + "fbclid=abc123",
        ]
        got = spark_batch_eval(spark, canonicalize_url, [base] + variants)
        assert all(g == got[0] for g in got[1:])


class TestCCNetLMFold:
    """ccnet_lm_fold must be provably identical to a full census rebuild
    on the union — the property that makes q168's incremental path safe to
    run daily without drift."""

    def _census_rows(self, df):
        return sorted(map(tuple, df.collect()))

    def test_fold_equals_rebuild(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from coldata_spark.queries.curation_queries import (
            ccnet_bigrams,
            ccnet_lm_census,
            ccnet_lm_fold,
        )
        from coldata_spark.tables import load

        ref = ccnet_bigrams(load(spark, sf_dir, "documents")).filter(
            F.col("lang") == "en"
        )
        for mod in (2, 3, 7):
            a = ref.filter(F.col("doc_id") % mod == 0)
            b = ref.filter(F.col("doc_id") % mod != 0)
            folded = ccnet_lm_fold(ccnet_lm_census(a), b)
            rebuilt = ccnet_lm_census(ref)
            assert self._census_rows(folded) == self._census_rows(rebuilt)

    def test_census_is_bounded(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from coldata_spark.queries.curation_queries import (
            ccnet_bigrams,
            ccnet_lm_census,
        )
        from coldata_spark.queries.curation_queries import _CCNET_B as B
        from coldata_spark.tables import load

        ref = ccnet_bigrams(load(spark, sf_dir, "documents")).filter(
            F.col("lang") == "en"
        )
        assert ccnet_lm_census(ref).count() <= 2 * B


def test_eight_gram_guard_short_docs(spark):
    """q163's gram exploder must not crash on <=7-token docs:
    sequence(1, 0) is descending [1, 0] and slice(w, 0, 8) raises
    INVALID_PARAMETER_VALUE.START (round-6 review finding, reproduced on
    PySpark 4.1.2).  Short docs contribute zero grams; 8+-token docs
    produce exactly size(w) - 7."""
    from coldata_spark.queries.curation_queries import _eight_gram_md5s

    docs = spark.createDataFrame(
        [
            (1, "a b c"),  # 3 tokens — crashed before the guard
            (2, ""),  # empty text
            (3, "one two three four five six seven eight nine"),  # 9 tokens
        ],
        "doc_id BIGINT, t STRING",
    )
    got = (
        _eight_gram_md5s(docs, "t")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    counts = {r["doc_id"]: r["count"] for r in got}
    assert counts == {3: 2}  # doc 3: 9 - 7 = 2 grams; short docs absent
