"""N -> 4N scaling-efficiency evidence (BASELINE.md measurement
protocol).

Runs the SAME full index build on the SAME deterministic synthetic
pages corpus at two parallelism levels — ``local[8]`` and
``local[32]`` (the sandbox stand-in for N vs 4N executors) — each in
a FRESH process (fresh JVM: no JIT/page-cache bias), reports docs/sec
at both plus::

    efficiency = throughput_32 / (4 * throughput_8)

and writes the result table to BENCH/BASELINE.md.

The corpus comes from ``fixtures.make_pages`` (seeded, no external
data) and is cached under /tmp across rounds.  The host shows
10-30% CPU steal (multi-tenant), so each level runs ``--reps`` times
and the fastest run is used.

Usage: python tools/scale_bench.py [--docs 240000] [--reps 2]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def ensure_corpus(n_docs: int, seed: int = 11) -> str:
    path = f"/tmp/se_scale_pages_{n_docs}_{seed}.parquet"
    if os.path.exists(path):
        return path
    from search_engine_spark.fixtures import write_pages_parquet

    t0 = time.time()
    write_pages_parquet(path, n_docs=n_docs, seed=seed)
    print(f"generated {n_docs}-doc corpus in {time.time()-t0:.1f}s -> {path}",
          file=sys.stderr)
    return path


def run_build(corpus: str, master: str, out: str) -> dict:
    cmd = [
        sys.executable, os.path.join(ROOT, "build_index.py"),
        "--input", corpus, "--out", out, "--master", master,
        "--no-resume", "--bucket-groups", "1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    if proc.returncode != 0:
        raise RuntimeError(f"build failed ({master}):\n{proc.stderr[-3000:]}")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--low", default="local[8]")
    ap.add_argument("--high", default="local[32]")
    ap.add_argument("--factor", type=int, default=4,
                    help="parallelism ratio high/low (N -> factor*N)")
    args = ap.parse_args()

    corpus = ensure_corpus(args.docs)
    samples: dict[str, list[dict]] = {args.low: [], args.high: []}
    # interleave the levels: the host's CPU-steal windows span minutes,
    # so alternating runs gives both levels comparable exposure and
    # min-of-k per level discards the stolen windows
    for rep in range(args.reps):
        for master in (args.low, args.high):
            out = f"/tmp/se_scale_ix_{master.replace('[','').replace(']','')}_{rep}"
            subprocess.run(["rm", "-rf", out], check=False)
            r = run_build(corpus, master, out)
            print(f"{master} rep{rep}: {r['seconds']}s "
                  f"({r['docs_per_sec']} docs/s)", file=sys.stderr)
            samples[master].append(r)
    results = {m: min(rs, key=lambda r: r["seconds"]) for m, rs in samples.items()}

    lo, hi = results[args.low], results[args.high]
    eff = hi["docs_per_sec"] / (args.factor * lo["docs_per_sec"])
    summary = {
        "metric": "index-build docs/sec scaling, N -> 4N cores",
        "corpus_docs": args.docs,
        "low": {"master": args.low, **lo},
        "high": {"master": args.high, **hi},
        "speedup": round(lo["seconds"] / hi["seconds"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — measured numbers ({stamp})

## Index-build scaling, N -> 4N (BASELINE.md protocol)

Same job (`build_index.py --no-resume --bucket-groups 1`), same input
({args.docs:,} synthetic pages, `fixtures.make_pages(seed=11)` — the
BASELINE input-hint schema `(url, warc_ts, html, text, lang)`), fresh
process per run, best of {args.reps} (host shows 10-30% CPU steal):

| master | wall sec (best) | docs/sec | all samples (sec) |
|---|---|---|---|
| `{args.low}` (N) | {lo['seconds']} | {lo['docs_per_sec']} | {", ".join(str(r['seconds']) for r in samples[args.low])} |
| `{args.high}` (4N) | {hi['seconds']} | {hi['docs_per_sec']} | {", ".join(str(r['seconds']) for r in samples[args.high])} |

- speedup {args.low} -> {args.high}: **{summary['speedup']}x**
- scaling efficiency = throughput_4N / (4 * throughput_N) =
  **{summary['scaling_efficiency']}** (target >= 0.8: {"PASS" if summary['pass'] else "MISS"})

The build is the full pipeline: Arrow tokenize (N1-N15 + Porter) ->
SPIMI postings (bucket-partitioned parquet) -> doc stats -> dictionary
-> delta+varint pack with block-max metadata + lineage checkpoints.
The dominant cost (per-doc parse, pack kernels) is embarrassingly
parallel; the fixed cost is the ~6 stage boundaries, which at
production scale amortize over much larger inputs than this sandbox
corpus.

## Per-round operator timings

See the driver-recorded `BENCH_r{{N}}.json` (produced by `bench.py` at
sf0.1, min-of-2 per query; cold full index build is single-shot).

## Reproduce

```bash
python tools/scale_bench.py --docs {args.docs} --reps {args.reps}
python bench.py
```
""")
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
