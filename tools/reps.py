"""Repeat-run medians for individual registry queries (BENCH_NOTES
5-rep protocol): the single-shot driver bench carries a 0.5-2s
first-execution cost (whole-stage-codegen + AQE replan + broadcast
build), so cross-round deltas on ~1s queries need steady-state medians
to mean anything.

Usage:
    python tools/reps.py [query ...]            # default 5 reps, sf0.1
    python tools/reps.py --standing             # core-28 + per-round adds
    SPARK_GRAFT_REPS=7 python tools/reps.py stream_interval_join

`--standing` is the per-round medians protocol set (BENCH_NOTES): the
baseline-shared core-28 from bench.py plus every operator added since
that needed one-off medians in a round note — folded here permanently
(VERDICT r08 task #8) so the steady-state trend stays comparable
across rounds without re-deriving the list by hand.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import warnings

warnings.filterwarnings("ignore", category=FutureWarning)
_pw = os.environ.get("PYTHONWARNINGS", "")
if "ignore::FutureWarning" not in _pw:
    os.environ["PYTHONWARNINGS"] = (
        _pw + ("," if _pw else "") + "ignore::FutureWarning"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hdp_tez_spark.session import get_session, warm_up


# Post-baseline operators that joined the medians protocol after their
# introduction round (one-off medians in BENCH_NOTES before this list
# existed). Grows append-only as rounds add headline operators.
STANDING_EXTRAS = [
    # r08 additions
    "skyline",
    "mmr_select",
    "assoc_rules",
    "peak_concurrency",
    "dup_spans",
    "semantic_dedup",
    "minhash_recall",
    # r09 additions
    "rolling_median",
    "seasonal_decompose",
    "pareto_contributors",
    "image_resize",
    # r09 second batch
    "srm_check",
    "ratio_metric_delta",
    "fdr_bh",
    "link_prediction",
    "ndcg_eval",
    "zipf_fit",
    # r09 third batch
    "kaplan_meier",
    "diff_in_diff",
    "label_propagation",
    "rake_keywords",
    # r09 fourth batch
    "nelson_aalen",
    "theil_sen",
    "ranking_eval",
    "containment",
    "embedding_outliers",
    "charclass_mix",
    "k_core",
    "sprt_check",
    "best_split",
    "rolling_corr",
    "oov_rate",
    "weighted_quantiles",
    "conformal",
    "stream_sprt",
    "quantile_normalize",
    "trimmed_mean",
    "blocking_eval",
    "lift_curve",
    "calibration_error",
    "distinct_ngrams",
    "stratified_kfold",
    "negative_sampling",
    # r10 additions (eighth batch)
    "target_encoding",
    "propensity_match",
    "bcubed_eval",
    "modularity",
    "hill_tail_index",
    "interarrival_stats",
    # r10 additions (ninth batch)
    "rfm_scores",
    "rare_categories",
    "sorted_neighborhood",
    "average_precision",
    "knn_label",
    "time_embargo_split",
    # r10 additions (tenth batch)
    "readability",
    "vocab_growth",
    "linkage_weights",
    "label_noise",
    "power_analysis",
    "behavior_entropy",
    # r10 additions (eleventh batch)
    "fleiss_kappa",
    "qini_auuc",
    "mcnemar",
    "event_affinity",
    "embedding_separability",
    "rank_overlap",
    # r10 additions (twelfth batch)
    "anova_f",
    "cramers_v",
    "wasserstein_1d",
    "good_turing",
    "keyness_llr",
    "hits_scores",
    # r10 additions (thirteenth batch)
    "levene_test",
    "friedman_test",
    "cochran_q",
    "icc",
    "runs_test",
    "isotonic_calibration",
    # r10 additions (fourteenth batch)
    "phash_near_dupes",
    "dispersion_test",
    "poisson_rate",
    "capture_recapture",
    "tokenizer_fertility",
    "odds_ratio",
]


def standing_set() -> list[str]:
    from bench import _CORE_N, HEADLINE

    return list(HEADLINE[:_CORE_N]) + STANDING_EXTRAS


def main() -> None:
    names = sys.argv[1:]
    if names == ["--standing"]:
        names = standing_set()
    if not names:
        raise SystemExit(
            "usage: python tools/reps.py <query> [query ...] | --standing"
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))

    spark = get_session("hdp-tez-spark-reps", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)

    qs = entry_mod.queries()
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "reps": times,
                    "median": round(statistics.median(times), 3),
                    "sf_dir": sf_dir,
                }
            )
        )


if __name__ == "__main__":
    main()
