"""Same-session A/B: q22's r12 hot-cell guard kernel vs the pre-guard
kernel (VERDICT r13 #1 / What's wrong #2).

q22's warm bench median moved 1.17 s (r10/r11) -> 1.30 (r12) -> 1.56 s
(r13) with the body unchanged since the r12 guard landed, and r13's
drift-normalized cold delta (+18.8%) was the largest in the table in a
near-normal calibration window. Two rounds of same-direction movement
must not be attributed to host drift a third time without a controlled
experiment, so this tool runs BOTH kernel bodies interleaved in ONE
session:

  arm ``guard``    — the registered q22 (current `_nd_pairs_kernel`:
                     per-cell len+branch, function-call indirection,
                     in-kernel `import hashlib/sys/numpy/pandas`).
  arm ``preguard`` — the exact pre-r12 `_pairs` closure body
                     (reconstructed byte-faithfully from commit
                     7988baa's removal diff: inline loop, imports
                     captured as closure cells, no cap branch), over
                     the SAME `_nd_assigned` upstream.

Below the 16384-row cap both arms compute identical pairs (the guard's
below-cap path calls the same block-pair math), so any wall delta IS
the guard's per-cell overhead. sf0.1 has ~2048 cells of ~29 rows, the
shape the bench measures.

Protocol (drift discipline per PARITY's adjudication protocol):
calibration probes at start / midpoint / end; one discarded cold run
per arm; then ``--rounds`` interleaved warm pairs with alternating
order (G,P / P,G / ...) so slot bias cancels; clearCache between every
run. Written BEFORE the data: if |median(G) - median(P)| is within
max(5%, either arm's own min-max spread), the guard is NOT the creep
and the r12->r13 movement is host/session drift (PARITY notes it, no
code change); a reproducible gap >= ~0.25 s warm means the per-cell
check must move off the hot path or be accepted with a PARITY note.

Usage:
    python tools/q22_guard_ab.py --out Q22AB_r14.json [--rounds 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import calib  # noqa: E402  (shared probe protocol)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def build_preguard_q22(spark, sf_dir: str):
    """The registered q22 plan with the PRE-r12 pair kernel: identical
    `_nd_assigned` upstream, identical schema/distinct downstream, the
    closure body below copied verbatim from the pre-guard
    `embedding_neardup_ivf` (commit 7988baa's `-` side)."""
    from spark_sql_pubsub_connector_spark.functions import vecnp
    from spark_sql_pubsub_connector_spark.plans.similarity import (
        NEARDUP_SIM_Q,
        _nd_assigned,
    )

    assigned = _nd_assigned(spark, sf_dir)
    thr = int(NEARDUP_SIM_Q)

    def _pairs(pdf):
        vids = pdf["vec_id"].to_numpy()
        nrs = pdf["nrm"].to_numpy()
        embs = [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        lens = np.array([v.size for v in embs], dtype=np.int64)
        out_a, out_b, out_s = [], [], []
        for L in set(lens.tolist()):
            idx = np.nonzero(lens == L)[0]
            if idx.size < 2:
                continue
            # vec_a < vec_b orientation via id-ascending row order
            idx = idx[np.argsort(vids[idx], kind="stable")]
            X = np.stack([embs[i] for i in idx])
            nr, vv = nrs[idx], vids[idx]
            B = X.shape[0]
            step = max(1, 4_000_000 // B)
            for i0 in range(0, B - 1, step):
                i1 = min(i0 + step, B - 1)
                dots = vecnp.dots_q(X[i0:i1], X[i0 + 1 :])
                sims = vecnp.sim_q9(
                    dots, nr[i0:i1, None], nr[None, i0 + 1 :]
                )
                jj = np.arange(i0 + 1, B)[None, :]
                mask = (jj > np.arange(i0, i1)[:, None]) & (sims >= thr)
                ai, bj = np.nonzero(mask)
                out_a.append(vv[i0 + ai])
                out_b.append(vv[i0 + 1 + bj])
                out_s.append(sims[ai, bj])
        if not out_a:
            return pd.DataFrame(
                {
                    "vec_a": np.empty(0, dtype=np.int64),
                    "vec_b": np.empty(0, dtype=np.int64),
                    "sim_q9": np.empty(0, dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "sim_q9": np.concatenate(out_s),
            }
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(_pairs, "vec_a bigint, vec_b bigint, sim_q9 bigint")
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="q22_guard_ab")
    sf_dir = args.sf_dir

    calib.warmup(spark, sf_dir)


    guard_build = all_specs()["q22_embedding_neardup"].build

    def run_once(build) -> float:
        t0 = time.perf_counter()
        df = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        return wall

    arms = {
        "guard": lambda: run_once(guard_build),
        "preguard": lambda: run_once(build_preguard_q22),
    }

    result: dict = {
        "tool": "q22_guard_ab",
        "subject": "q22_embedding_neardup warm creep r10->r13 (1.17->1.30->1.56 s)",
        "sf_dir": sf_dir,
        "rounds": args.rounds,
        "session": {
            "driver_memory": spark.conf.get("spark.driver.memory", "unset"),
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions"
            ),
            "master": spark.conf.get("spark.master", "unset"),
        },
        "interpretation_guide": (
            "written before the data: arms identical below the 16384-row "
            "cap except guard's per-cell branch/indirection/in-kernel "
            "imports; |median delta| within max(5%, within-arm spread) "
            "=> guard is NOT the creep, r12->r13 movement is host/session "
            "drift; reproducible >=0.25 s gap => move the check off the "
            "hot path or accept with a PARITY note"
        ),
    }

    # sanity: both arms produce the same pair set (below-cap identity)
    n_guard = guard_build(spark, sf_dir).count()
    n_pre = build_preguard_q22(spark, sf_dir).count()
    result["output_rows"] = {"guard": n_guard, "preguard": n_pre}
    assert n_guard == n_pre, (n_guard, n_pre)
    spark.catalog.clearCache()

    result["calibration_start"] = calib.calib3(spark)
    result["cold"] = {
        "guard": round(arms["guard"](), 4),
        "preguard": round(arms["preguard"](), 4),
    }
    runs: dict[str, list[float]] = {"guard": [], "preguard": []}
    order_log = []
    for r in range(args.rounds):
        if r == args.rounds // 2:
            result["calibration_mid"] = calib.calib3(spark)
        order = (
            ["guard", "preguard"] if r % 2 == 0 else ["preguard", "guard"]
        )
        for arm in order:
            runs[arm].append(round(arms[arm](), 4))
        order_log.append(order)
    result["calibration_end"] = calib.calib3(spark)
    result["order"] = order_log
    result["warm_runs"] = runs

    def spread(v: list[float]) -> float:
        return round(100.0 * (max(v) - min(v)) / min(v), 1)

    med_g = statistics.median(runs["guard"])
    med_p = statistics.median(runs["preguard"])
    result["warm_median"] = {
        "guard": round(med_g, 4),
        "preguard": round(med_p, 4),
    }
    result["warm_min"] = {
        "guard": min(runs["guard"]),
        "preguard": min(runs["preguard"]),
    }
    result["within_arm_spread_pct"] = {
        "guard": spread(runs["guard"]),
        "preguard": spread(runs["preguard"]),
    }
    delta_pct = round(100.0 * (med_g - med_p) / med_p, 1)
    result["guard_vs_preguard_median_delta_pct"] = delta_pct
    band = max(
        5.0,
        result["within_arm_spread_pct"]["guard"],
        result["within_arm_spread_pct"]["preguard"],
    )
    result["verdict"] = (
        "guard-not-the-creep (delta inside noise band)"
        if abs(delta_pct) <= band
        else "guard-overhead-real (delta outside noise band)"
    )
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["warm_median"]), result["verdict"])


if __name__ == "__main__":
    main()
