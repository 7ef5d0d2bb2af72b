

class TestCcnetBuckets:
    def _df(self, spark):
        # lang 'a': docs 0-8 with increasingly repeated (=more probable)
        # tokens; lang 'b': 6 docs
        rows = []
        for i in range(9):
            toks = ["common"] * (i + 1) + [f"rare{i}"]
            rows.append((i, "a", " ".join(toks)))
        for i in range(9, 15):
            rows.append((i, "b", f"w{i % 3} w{i % 3} z{i}"))
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def test_terciles_per_language(self, spark):
        from denormalized_spark.operators.text import ccnet_buckets

        out = ccnet_buckets(self._df(spark)).collect()
        per = {}
        for r in out:
            per.setdefault((r["lang"], r["bucket"]), []).append(r["doc_id"])
        assert {len(v) for k, v in per.items() if k[0] == "a"} == {3}
        assert {len(v) for k, v in per.items() if k[0] == "b"} == {2}
        # within lang 'a', heads have strictly higher scores than tails
        scores = {r["doc_id"]: r["rlogp"] for r in out if r["lang"] == "a"}
        assert min(scores[i] for i in per[("a", "head")]) >= max(
            scores[i] for i in per[("a", "tail")]
        )

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.text import ccnet_buckets

        df = self._df(spark)
        a = ccnet_buckets(df).collect()
        b = ccnet_buckets(df.repartition(7)).collect()
        key = lambda rs: sorted((r["doc_id"], r["bucket"]) for r in rs)
        assert key(a) == key(b)


class TestBm25:
    def _df(self, spark):
        # equal doc length, strictly decreasing query-term coverage:
        # rank order is forced regardless of the k1/b knobs
        rows = [
            (1, "scan join filter x"),
            (2, "scan join x y"),
            (3, "scan x y z"),
            (4, "x y z w"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ranking_and_coverage(self, spark):
        from denormalized_spark.operators.text import bm25_topk

        out = bm25_topk(
            self._df(spark), ["scan", "join", "filter"], k=10
        ).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]  # doc 4: no terms
        scores = [r["bm25"] for r in out]
        assert scores[0] > scores[1] > scores[2] > 0

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.text import bm25_topk

        rows = [
            (i, " ".join(["scan"] * (i % 4) + ["join"] * (i % 3) + [f"w{i}"]))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = bm25_topk(df, ["scan", "join"], k=7).collect()
        b = bm25_topk(df.repartition(11), ["scan", "join"], k=7).collect()
        assert [(r["doc_id"], r["bm25"]) for r in a] == [
            (r["doc_id"], r["bm25"]) for r in b
        ]
