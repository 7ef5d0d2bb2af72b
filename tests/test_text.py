

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
