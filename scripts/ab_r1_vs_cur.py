#!/usr/bin/env python
"""A/B: round-1 pipeline tip vs the current tip on the same-sized corpus
(VERDICT r2 #2 — the dedicated scaling runs regressed 25-35% r1→r2).

Each sample is its own process (the two trees can't share one interpreter);
A and B alternate back-to-back so each A/B pair shares this VM's
multi-minute noise window. Reports per-round pair ratios and min-of-rounds
throughput for both tips.

Usage:
    git worktree add /tmp/r1tip <r1-commit>
    python scripts/ab_r1_vs_cur.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1 = "/tmp/r1tip"

_SNIPPET = r"""
import json, sys, time
from bench import make_session
from pdf_extractor_scripts_spark.fixtures import corpus_df_dist
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline

def _force(df):
    df.write.format("noop").mode("overwrite").save()

n_docs = int(sys.argv[1])
spark = make_session(32)
w = corpus_df_dist(spark, 20000, seed=7).localCheckpoint(eager=True)
for _ in range(2):
    _force(run_pipeline(w))
docs = corpus_df_dist(spark, n_docs, seed=42).localCheckpoint(eager=True)
ts = []
for _ in range(3):  # 3 adjacent passes per process: the min dodges stragglers
    t0 = time.time()
    _force(run_pipeline(docs))
    ts.append(time.time() - t0)
spark.stop()
print("RESULT " + json.dumps(ts))
"""


def run_tip(tree: str, n_docs: int) -> list[float]:
    env = dict(os.environ, PYTHONPATH=tree)
    r = subprocess.run(
        [sys.executable, "-c", _SNIPPET, str(n_docs)],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{tree}: no RESULT line\n{r.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    assert os.path.isdir(R1), "create the worktree first (see module docstring)"

    samples = {"r1": [], "cur": []}
    pair_ratios = []
    for i in range(rounds):
        a = run_tip(R1, n_docs)
        b = run_tip(REPO, n_docs)
        samples["r1"].append(a)
        samples["cur"].append(b)
        pair_ratios.append(round(min(b) / min(a), 3))  # >1 = current slower

    best_r1 = min(x for xs in samples["r1"] for x in xs)
    best_cur = min(x for xs in samples["cur"] for x in xs)
    print(json.dumps({
        "n_docs": n_docs,
        "rounds": rounds,
        "r1_best_sec": round(best_r1, 3),
        "cur_best_sec": round(best_cur, 3),
        "r1_docs_per_sec": round(n_docs / best_r1, 1),
        "cur_docs_per_sec": round(n_docs / best_cur, 1),
        "cur_over_r1_wall_ratio": round(best_cur / best_r1, 3),
        "per_round_pair_ratios": pair_ratios,
        "all_samples": {k: [[round(x, 3) for x in xs] for xs in v]
                        for k, v in samples.items()},
    }))


if __name__ == "__main__":
    main()
