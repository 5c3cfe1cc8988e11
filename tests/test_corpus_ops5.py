"""Round-5 batch 5: classifier evaluation (ROC AUC via rank statistic,
calibration bins), footer boilerplate, RSS/Atom feed parsing, and
page-level robots directives."""

from __future__ import annotations

from deepseek_ocr_omnidocbench_spark.operators.classifier import (
    auc_report,
    calibration_report,
)
from deepseek_ocr_omnidocbench_spark.operators.filters import (
    host_suffix_stats,
    meta_robots_gate,
)
from deepseek_ocr_omnidocbench_spark.operators.robots import parse_feeds


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "source string, score double, label int")


class TestAucReport:
    def test_perfect_separation(self, spark):
        rows = [("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0)]
        out = auc_report(_scored(spark, rows)).collect()[0]
        assert out["auc"] == 1.0
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (2, 0, 0, 2)
        assert out["precision"] == 1.0 and out["recall"] == 1.0
        assert out["f1"] == 1.0 and out["accuracy"] == 1.0

    def test_hand_computed_with_ties(self, spark):
        # scores: pos at .7, .5; neg at .5, .3.  Pairs (pos, neg):
        # (.7,.5)=1, (.7,.3)=1, (.5,.5)=0.5 (tie), (.5,.3)=1
        # AUC = 3.5/4 = 0.875.
        rows = [("a", 0.7, 1), ("a", 0.5, 1), ("a", 0.5, 0), ("a", 0.3, 0)]
        out = auc_report(_scored(spark, rows)).collect()[0]
        assert out["auc"] == 0.875
        # threshold 0.5: preds pos for .7,.5,.5 -> tp=2 fp=1 fn=0 tn=1
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (2, 1, 0, 1)
        assert out["precision"] == round(2 / 3, 6)
        assert out["recall"] == 1.0
        assert out["f1"] == 0.8
        assert out["accuracy"] == 0.75

    def test_reversed_classifier_auc_zero(self, spark):
        rows = [("a", 0.9, 0), ("a", 0.1, 1)]
        out = auc_report(_scored(spark, rows)).collect()[0]
        assert out["auc"] == 0.0

    def test_single_class_group_null_auc(self, spark):
        rows = [("a", 0.9, 1), ("a", 0.1, 1)]
        out = auc_report(_scored(spark, rows)).collect()[0]
        assert out["auc"] is None
        assert out["n_neg"] == 0
        # P/R still defined from the confusion block
        assert out["recall"] == 0.5

    def test_groups_independent(self, spark):
        rows = [("a", 0.9, 1), ("a", 0.1, 0),
                ("b", 0.9, 0), ("b", 0.1, 1)]
        out = {r["source"]: r for r in
               auc_report(_scored(spark, rows)).collect()}
        assert out["a"]["auc"] == 1.0 and out["b"]["auc"] == 0.0


class TestCalibrationReport:
    def test_hand_computed_bins(self, spark):
        # bin 0: scores .0 and .05 (one pos) -> conf .025, acc .5
        # bin 9: scores .95 and 1.0-eps... use .95, .9 (both pos)
        rows = [("a", 0.0, 0), ("a", 0.05, 1),
                ("a", 0.9, 1), ("a", 0.95, 1)]
        out = {r["bin"]: r for r in
               calibration_report(_scored(spark, rows)).collect()}
        assert set(out) == {0, 9}
        assert out[0]["n"] == 2 and out[0]["n_pos"] == 1
        assert out[0]["conf_avg"] == 0.025 and out[0]["acc"] == 0.5
        assert out[0]["gap"] == 0.475
        assert out[0]["weight"] == 0.5
        assert out[9]["conf_avg"] == 0.925 and out[9]["acc"] == 1.0
        assert out[9]["gap"] == 0.075

    def test_score_one_clamps_to_top_bin(self, spark):
        rows = [("a", 1.0, 1)]
        out = calibration_report(_scored(spark, rows)).collect()
        assert len(out) == 1 and out[0]["bin"] == 9


class TestHostSuffixStats:
    def _stats(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "source string, text string")
        return {r["host"]: r for r in host_suffix_stats(df, **kw).collect()}

    def test_shared_footer_detected(self, spark):
        footer = " (c) 2024 example corp all rights reserved"
        out = self._stats(spark, [
            ("h1", "first doc body" + footer),
            ("h1", "a different second doc" + footer),
            ("h1", "third one entirely" + footer)])
        r = out["h1"]
        assert r["shared_suffix"] == footer
        assert r["suffix_len"] == len(footer)
        assert r["is_boilerplate"]

    def test_no_shared_suffix(self, spark):
        out = self._stats(spark, [("h1", "alpha ends x"),
                                  ("h1", "beta ends y")])
        assert out["h1"]["suffix_len"] == 0
        assert not out["h1"]["is_boilerplate"]

    def test_single_doc_not_boilerplate(self, spark):
        out = self._stats(spark, [("h1", "only doc long enough suffix")])
        # whole text is its own common suffix, but n_docs < 2
        assert not out["h1"]["is_boilerplate"]

    def test_cap_respected(self, spark):
        long_footer = "z" * 500
        out = self._stats(spark, [("h1", "a " + long_footer),
                                  ("h1", "b " + long_footer)],
                          max_suffix=200)
        assert out["h1"]["suffix_len"] == 200
        assert out["h1"]["shared_suffix"] == "z" * 200


class TestParseFeeds:
    def _parse(self, spark, xml):
        df = spark.createDataFrame([("h.example", xml)],
                                   "host string, xml string")
        return parse_feeds(df).orderBy("link").collect()

    def test_rss_items(self, spark):
        xml = ("<rss><channel>"
               "<item><title>A</title><link>https://h/1</link>"
               "<pubDate>Mon, 01 Jan 2024</pubDate></item>"
               "<item><link> https://h/2 </link></item>"
               "</channel></rss>")
        out = self._parse(spark, xml)
        assert [(r["link"], r["title"], r["published"], r["kind"])
                for r in out] == [
            ("https://h/1", "A", "Mon, 01 Jan 2024", "rss"),
            ("https://h/2", None, None, "rss")]

    def test_atom_entries(self, spark):
        xml = ('<feed><entry><title>B</title>'
               '<link href="https://h/a"/>'
               "<updated>2024-01-02</updated></entry></feed>")
        out = self._parse(spark, xml)
        assert len(out) == 1
        r = out[0]
        assert (r["link"], r["title"], r["published"], r["kind"]) == \
            ("https://h/a", "B", "2024-01-02", "atom")

    def test_missing_link_dropped(self, spark):
        xml = "<rss><channel><item><title>no link</title></item></channel></rss>"
        assert self._parse(spark, xml) == []

    def test_optional_fields_do_not_shift(self, spark):
        # first item has no date; second does — block-first parsing
        # must not let the second date attach to the first item.
        xml = ("<rss><channel>"
               "<item><link>https://h/1</link></item>"
               "<item><link>https://h/2</link>"
               "<pubDate>D2</pubDate></item></channel></rss>")
        out = self._parse(spark, xml)
        assert [(r["link"], r["published"]) for r in out] == [
            ("https://h/1", None), ("https://h/2", "D2")]


class TestMetaRobots:
    def _gate(self, spark, html, url="https://u/1"):
        df = spark.createDataFrame([(url, html)], "url string, html string")
        return meta_robots_gate(df).collect()[0]

    def test_noindex_nofollow(self, spark):
        r = self._gate(
            spark,
            '<head><meta name="robots" content="noindex, nofollow"></head>')
        assert r["noindex"] and r["nofollow"]
        assert r["robots_meta"] == "noindex, nofollow"

    def test_none_directive_means_both(self, spark):
        r = self._gate(spark,
                       '<head><meta name="robots" content="none"></head>')
        assert r["noindex"] and r["nofollow"]

    def test_index_follow_keeps(self, spark):
        r = self._gate(
            spark,
            '<head><meta name="robots" content="index, follow"></head>')
        assert not r["noindex"] and not r["nofollow"]

    def test_case_insensitive(self, spark):
        r = self._gate(
            spark, "<head><META NAME='ROBOTS' CONTENT='NOINDEX'></head>")
        assert r["noindex"] and not r["nofollow"]

    def test_substring_token_does_not_match(self, spark):
        # "nosnippet" contains neither token; "noindexing" must not
        # match the noindex token boundary.
        r = self._gate(
            spark,
            '<head><meta name="robots" content="noindexing,nosnippet">'
            "</head>")
        assert not r["noindex"] and not r["nofollow"]

    def test_canonical_overrides_dedup_key(self, spark):
        r = self._gate(
            spark,
            '<head><link rel="canonical" href="https://c/x"></head>',
            url="https://u/dup")
        assert r["canonical"] == "https://c/x"
        assert r["dedup_key"] == "https://c/x"

    def test_no_directives_defaults(self, spark):
        r = self._gate(spark, "<head><title>t</title></head>")
        assert r["robots_meta"] is None and r["canonical"] is None
        assert not r["noindex"] and not r["nofollow"]
        assert r["dedup_key"] == "https://u/1"


class TestPageAlternates:
    def _parse(self, spark, html, url="https://u/1"):
        from deepseek_ocr_omnidocbench_spark.operators.filters import (
            page_alternates)
        df = spark.createDataFrame([(url, html)], "url string, html string")
        return page_alternates(df).orderBy("href").collect()

    def test_attribute_order_irrelevant(self, spark):
        html = ('<head>'
                '<link href="https://u/de" rel="alternate" hreflang="de">'
                '<link rel="alternate" hreflang="fr" href="https://u/fr">'
                "</head>")
        out = self._parse(spark, html)
        assert [(r["hreflang"], r["href"]) for r in out] == [
            ("de", "https://u/de"), ("fr", "https://u/fr")]

    def test_amphtml_no_hreflang(self, spark):
        html = '<link rel="amphtml" href="https://u/amp">'
        out = self._parse(spark, html)
        assert len(out) == 1
        assert out[0]["rel"] == "amphtml" and out[0]["hreflang"] is None

    def test_other_rels_dropped(self, spark):
        html = ('<link rel="stylesheet" href="https://u/s.css">'
                '<link rel="canonical" href="https://u/c">')
        assert self._parse(spark, html) == []

    def test_case_insensitive_rel(self, spark):
        html = "<LINK REL='ALTERNATE' HREFLANG='EN' HREF='https://u/en'>"
        out = self._parse(spark, html)
        assert out[0]["rel"] == "alternate" and out[0]["hreflang"] == "en"


class TestVariantClusters:
    def _cluster(self, spark, rows):
        from deepseek_ocr_omnidocbench_spark.operators.filters import (
            variant_clusters)
        df = spark.createDataFrame(rows, "url string, html string")
        return {r["url"]: r["cluster_id"]
                for r in variant_clusters(df).collect()}

    def test_mutual_editions_plus_amp_one_cluster(self, spark):
        a = '<link rel="alternate" hreflang="de" href="https://u/de">' \
            '<link rel="amphtml" href="https://u/amp">'
        b = '<link rel="alternate" hreflang="en" href="https://u/en">'
        out = self._cluster(spark, [("https://u/en", a),
                                    ("https://u/de", b)])
        # amp url joins the component; min member is https://u/amp
        assert out["https://u/en"] == out["https://u/de"] == "https://u/amp"

    def test_page_without_alternates_singleton(self, spark):
        out = self._cluster(spark, [("https://u/solo", "<p>x</p>")])
        assert out["https://u/solo"] == "https://u/solo"

    def test_declared_phantom_target_links_cluster(self, spark):
        # two pages never reference each other directly — both declare
        # the same (unfetched) phantom edition, which bridges them
        a = '<link rel="alternate" hreflang="fr" href="https://u/fr">'
        out = self._cluster(spark, [("https://u/en", a),
                                    ("https://u/de", a)])
        assert out["https://u/en"] == out["https://u/de"]


class TestSkewStats:
    def _stats(self, spark, keys):
        from deepseek_ocr_omnidocbench_spark.operators.sketches import (
            skew_stats)
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        return skew_stats(df, "key").collect()[0]

    def test_uniform_keys_gini_zero_salt_one(self, spark):
        r = self._stats(spark, ["a", "a", "b", "b"])
        assert r["gini"] == 0.0
        assert r["salt_factor"] == 1
        assert r["mean_count"] == 2.0

    def test_hand_computed_skew(self, spark):
        # counts a:1, b:3 sorted (1,3): G = (2*(1*1+2*3) - 3*4)/(2*4)
        r = self._stats(spark, ["a", "b", "b", "b"])
        assert r["gini"] == 0.25
        assert r["max_key"] == "b" and r["max_count"] == 3
        assert r["salt_factor"] == 2  # ceil(3*2/4)

    def test_single_viral_key(self, spark):
        r = self._stats(spark, ["v"] * 7 + ["a", "b", "c"])
        # sorted (1,1,1,7): G = (2*(1+2+3+28) - 5*10)/(4*10) = 18/40
        assert r["gini"] == 0.45
        assert r["max_key"] == "v"
        assert r["salt_factor"] == 3  # ceil(7*4/10)


class TestRobotsSitemaps:
    def _parse(self, spark, txt):
        from deepseek_ocr_omnidocbench_spark.operators.robots import (
            robots_sitemaps)
        df = spark.createDataFrame([("h", txt)], "host string, txt string")
        return [r["sitemap_url"]
                for r in robots_sitemaps(df).orderBy("pos").collect()]

    def test_multiple_directives_ordered(self, spark):
        txt = ("User-agent: *\nDisallow: /x\n"
               "Sitemap: https://h/a.xml\n"
               "Allow: /\n"
               "sitemap: https://h/b.xml\n")
        assert self._parse(spark, txt) == ["https://h/a.xml",
                                           "https://h/b.xml"]

    def test_case_and_whitespace_tolerant(self, spark):
        txt = "  SITEMAP :   https://h/c.xml  \n"
        assert self._parse(spark, txt) == ["https://h/c.xml"]

    def test_no_directive_no_rows(self, spark):
        assert self._parse(spark, "User-agent: *\nDisallow: /\n") == []

    def test_midline_mention_ignored(self, spark):
        # 'Sitemap:' must start its own line (modulo whitespace)
        txt = "Disallow: /see-sitemap: https://h/x.xml\n"
        assert self._parse(spark, txt) == []


class TestDeltaDedup:
    def _run(self, spark, old_rows, new_rows, **kw):
        from deepseek_ocr_omnidocbench_spark.operators.dedup import (
            delta_dedup, md5_hash64)
        old = spark.createDataFrame(old_rows, "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        kw.setdefault("hash_fn", md5_hash64)
        kw.setdefault("k", 8)
        kw.setdefault("bands", 4)
        return {r["doc_id"]: r
                for r in delta_dedup(new, old, **kw).collect()}

    def test_exact_copy_matches_old(self, spark):
        body = "the quick brown fox jumps over the lazy dog again and again"
        out = self._run(spark, [(0, body)], [(1, body), (3, "completely "
                        "different content about unrelated things here")])
        assert out[1]["dup_of"] == 0 and out[1]["jaccard"] == 1.0
        assert not out[1]["is_new"]
        assert out[3]["is_new"] and out[3]["dup_of"] is None

    def test_best_match_ties_to_min_old_id(self, spark):
        body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        out = self._run(spark, [(0, body), (2, body)], [(1, body)])
        assert out[1]["dup_of"] == 0  # both old docs perfect; min id wins

    def test_below_threshold_is_new(self, spark):
        a = "one two three four five six seven eight nine ten"
        b = "one two three four five eleven twelve thirteen fourteen fifteen"
        out = self._run(spark, [(0, a)], [(1, b)], threshold=0.9)
        assert out[1]["is_new"]

    def test_prebuilt_store_reused(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.dedup import (
            delta_dedup, md5_hash64, minhash_band_buckets)
        body = "shared content row for the persisted signature store path"
        old = spark.createDataFrame([(0, body)], "doc_id long, text string")
        new = spark.createDataFrame([(1, body)], "doc_id long, text string")
        store = minhash_band_buckets(old, k=8, bands=4,
                                     hash_fn=md5_hash64)
        out = delta_dedup(new, old, k=8, bands=4, hash_fn=md5_hash64,
                          store=store).collect()[0]
        assert out["dup_of"] == 0 and not out["is_new"]


class TestRobustStats:
    def _stats(self, spark, rows, **kw):
        from deepseek_ocr_omnidocbench_spark.operators.sketches import (
            robust_stats)
        df = spark.createDataFrame(rows, "source string, n long")
        return {r["source"]: r
                for r in robust_stats(df, "source", "n", **kw).collect()}

    def test_hand_computed(self, spark):
        # vals 1..9 + outlier 1000: median = value at ceil(10/2)=rank 5
        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
        out = self._stats(spark, [("a", v) for v in vals])["a"]
        assert out["median"] == 5
        # |v-5| sorted: 0,1,1,2,2,3,3,4,995 + |4-5|=1 -> rank5 value 2
        assert out["mad"] == 2
        # trim ceil(1)=1 from each end: ranks 2..9 -> 2..9 sum 44 / 8
        assert out["trimmed_mean"] == 5.5
        assert out["mean"] == round(sum(vals) / 10, 6)

    def test_outlier_resistance(self, spark):
        clean = [("a", v) for v in range(1, 12)]
        dirty = clean[:-1] + [("a", 10**9)]
        s1 = self._stats(spark, clean)["a"]
        s2 = self._stats(spark, dirty)["a"]
        assert s1["median"] == s2["median"] == 6
        assert abs(s2["mean"] - s1["mean"]) > 10**7  # mean blew up
        assert s2["trimmed_mean"] == s1["trimmed_mean"] == 6.0

    def test_single_value_group(self, spark):
        out = self._stats(spark, [("a", 42)])["a"]
        assert out["median"] == 42 and out["mad"] == 0
        assert out["mean"] == 42.0


class TestZorderKey:
    def _keys(self, spark, pairs, bits=4):
        from deepseek_ocr_omnidocbench_spark.operators.sketches import (
            zorder_key)
        from pyspark.sql import functions as F
        df = spark.createDataFrame(pairs, "a long, b long")
        return [r["z"] for r in df.select(
            zorder_key(F.col("a"), F.col("b"), bits=bits).alias("z"))
            .collect()]

    def test_hand_computed_interleave(self, spark):
        # a=0b10, b=0b01 -> bits: a1@pos3, a0@pos1, b1@pos2, b0@pos0
        # z = 1000 | 0000 | 0100? a=2: bit1=1 -> pos 3; b=1: bit0=1 -> pos 0
        assert self._keys(spark, [(2, 1)]) == [0b1001]
        assert self._keys(spark, [(0, 0)]) == [0]
        assert self._keys(spark, [(15, 15)]) == [0b11111111]

    def test_quadrant_prefix_property(self, spark):
        # the top two z-bits are (a_msb, b_msb): every point of a
        # quadrant sorts before every point of a later quadrant
        import itertools
        pts = list(itertools.product(range(8), range(8)))
        keys = self._keys(spark, pts, bits=3)
        quad = {(a, b): (a >> 2, b >> 2) for a, b in pts}
        for (p, kp) in zip(pts, keys):
            for (q, kq) in zip(pts, keys):
                qp, qq = quad[p], quad[q]
                if (qp[0] * 2 + qp[1]) < (qq[0] * 2 + qq[1]):
                    assert kp < kq, (p, q)

    def test_bijective_over_domain(self, spark):
        import itertools
        pts = list(itertools.product(range(8), range(8)))
        keys = self._keys(spark, pts, bits=3)
        assert len(set(keys)) == 64 and max(keys) == 63


class TestReviewRegressions:
    """Fixes from the batch-5/6 code review — each was runtime-confirmed
    broken before the fix."""

    def test_ks_single_source_corpus_null_not_crash(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.textstats import (
            ks_by_group)
        df = spark.createDataFrame([("only", 1), ("only", 2)],
                                   "source string, n long")
        out = ks_by_group(df, "n").collect()
        assert len(out) == 1
        assert out[0]["n_b"] == 0 and out[0]["d_stat"] is None

    def test_bowtie_empty_graph_returns_empty(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.graph import bowtie
        df = spark.createDataFrame([(5, 5)], "src long, dst long")
        out = bowtie(df)
        assert out.count() == 0
        assert out.columns == ["node", "scc_id", "region"]

    def test_meta_robots_attribute_order_swapped(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.filters import (
            meta_robots_gate)
        html = ('<head><meta content="noindex" name="robots">'
                '<link href="https://c/x" rel="canonical"></head>')
        df = spark.createDataFrame([("https://u/1", html)],
                                   "url string, html string")
        r = meta_robots_gate(df).collect()[0]
        assert r["noindex"] and r["canonical"] == "https://c/x"
        assert r["dedup_key"] == "https://c/x"

    def test_retrieval_eval_all_ranks_beyond_k_zero_ndcg(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.ranking import (
            retrieval_eval)
        runs = spark.createDataFrame([(1, 10, 11)],
                                     "query_id long, doc_id long, rank int")
        qrels = spark.createDataFrame([(1, 10, 1)],
                                      "query_id long, doc_id long, rel int")
        out = retrieval_eval(runs, qrels, k=10).collect()[0]
        assert out["ndcg"] == 0.0  # was NULL before the fix

    def test_calibration_negative_score_clamps_to_bin_zero(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.classifier import (
            calibration_report)
        df = spark.createDataFrame([("g", -0.25, 0)],
                                   "source string, score double, label int")
        out = calibration_report(df).collect()
        assert len(out) == 1 and out[0]["bin"] == 0

    def test_feeds_multiline_field_values_survive(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.robots import (
            parse_feeds)
        xml = ("<rss><channel><item><title>two\nlines</title>"
               "<link>\nhttps://h/1\n</link></item></channel></rss>")
        df = spark.createDataFrame([("h", xml)], "host string, xml string")
        out = parse_feeds(df).collect()
        assert len(out) == 1
        assert out[0]["link"] == "https://h/1"
        assert out[0]["title"] == "two\nlines"
