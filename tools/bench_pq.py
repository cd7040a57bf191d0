"""IVF-PQ serving A/B: compressed (codes+norm) vs full-precision index.

Claim under test: pq_store's codes REPLACE the raw embedding in the
stored list_id layout, so the probed-list scan reads a fraction of the
bytes and the ADC join scores candidates without decompressing — at
10^12 vectors the index scan bytes are the serving cost that matters.
Both variants use the SAME probed lists (identical PartitionFilters
pruning); the difference under test is the per-candidate payload +
scoring mechanism: full-precision exact-cosine re-rank (ivf_topk_stored)
vs ADC table lookups (pq_topk_stored).

Method (tools/bench_ivf_store.py hygiene): staged tmpfs corpus, fresh
taskset-pinned JVM, builds untimed, per-variant warm-up then best-of-3,
host sha256 probes bracketing the child. Reports stored index bytes for
both layouts (the compression ratio) and the PQ-vs-exact rank overlap
at this corpus (recall is data-dependent; measured, never assumed).

Writes BENCH/pq_ab.json (rendered into BENCH/BASELINE.md by
tools/bench_scaling.regen_md) and prints one JSON line.

Usage: python tools/bench_pq.py [n_vecs] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_STAGER = r"""
import sys
sys.path.insert(0, {repo!r})
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark import synth
spark = get_spark(shuffle_partitions=32,
                  extra_conf={{"spark.local.dir": "/dev/shm/bpq_stage"}})
(synth.generate_embeddings(spark, {n_vecs}, partitions=64)
 .write.mode("overwrite").parquet({stage_dir!r} + "/vecs"))
print("STAGED")
"""

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark.operators import similarity as SIM
from gtfs_osm_sync_spark.operators import pq as PQ

N_LISTS, NPROBE, K = 128, 8, 10
spark = get_spark(shuffle_partitions={cpus},
                  extra_conf={{"spark.local.dir": "/dev/shm/bpq_child"}})
corpus = spark.read.parquet({stage_dir!r} + "/vecs")
n_vecs = corpus.count()

train = corpus.filter(F.col("vec_id") % 20 == 0)
cents = SIM.kmeans_centroids(train, n_lists=N_LISTS, iters=3)
# serving convention: codebooks collected ONCE (load_codebooks) and held
# driver-side for the process lifetime — not re-collected per query batch
books_df = PQ.pq_train(train, m=8, k=16, iters=2)
books = PQ.load_codebooks(books_df)

t0 = time.time()
ivf = SIM.ivf_store(corpus, cents, {stage_dir!r} + "/ivf")
t_build_ivf = time.time() - t0
t0 = time.time()
pqs = PQ.pq_store(corpus, cents, books_df, {stage_dir!r} + "/pq")
t_build_pq = time.time() - t0

def tree_bytes(root):
    total = 0
    for d, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(d, f))
    return total

bytes_ivf = tree_bytes({stage_dir!r} + "/ivf")
bytes_pq = tree_bytes({stage_dir!r} + "/pq")

q = corpus.filter(F.col("vec_id") % max(n_vecs // 4, 1) == 0).cache()
n_q = q.count()
n_probed = (SIM._ivf_probes(q, cents, NPROBE)
            .select("list_id").distinct().count())

def consume(df, cols):
    return tuple(df.agg(F.bit_xor(F.xxhash64(*cols)), F.count("*")).collect()[0])

def full():
    return SIM.ivf_topk_stored(spark, q, ivf, cents, k=K, nprobe=NPROBE)

def pq_run():
    return PQ.pq_topk_stored(spark, q, pqs, cents, books, k=K, nprobe=NPROBE)

def timed(fn, cols, trials=3):
    sig = consume(fn(), cols)  # warm-up + result signature
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        assert consume(fn(), cols) == sig
        best = min(best, time.time() - t0)
    return best

t_full = timed(full, ["q_id", "n_id", "rank_k"])
t_pq = timed(pq_run, ["q_id", "n_id", "rank_k"])

# quality on the CLUSTERED synth corpus (generate_embeddings: cluster =
# vec_id % 64): top-k overlap between PQ and exact ranks is a
# needle-in-haystack statistic here (each query's true top-10 sit among
# ~n/64 near-identical same-cluster siblings), so report BOTH overlap
# and same-cluster precision — the retrieval-quality measure that
# matters: does the compressed index still send you to the right
# neighborhood?
f = full().select("q_id", "n_id")
p = pq_run().select("q_id", "n_id")
n_hit = p.join(f, ["q_id", "n_id"], "left_semi").count()
n_tot = f.count()

def cluster_precision(df):
    n_same = df.filter(F.col("q_id") % 64 == F.col("n_id") % 64).count()
    return int(round(n_same * 1000 / max(df.count(), 1)))

out = dict(
    n_vecs=n_vecs, n_lists=N_LISTS, nprobe=NPROBE, k=K, n_queries=n_q,
    n_probed_lists=n_probed,
    build_ivf_sec=round(t_build_ivf, 2), build_pq_sec=round(t_build_pq, 2),
    index_bytes_full=bytes_ivf, index_bytes_pq=bytes_pq,
    compression=round(bytes_ivf / bytes_pq, 2),
    full_serve_sec=round(t_full, 3), pq_serve_sec=round(t_pq, 3),
    speedup=round(t_full / t_pq, 2),
    overlap_milli=int(round(n_hit * 1000 / n_tot)),
    cluster_precision_full_milli=cluster_precision(f),
    cluster_precision_pq_milli=cluster_precision(p),
)
print("RESULT " + json.dumps(out))
"""


def _host_probe() -> float:
    import hashlib

    buf = b"\x5a" * (1 << 20)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        h = hashlib.sha256()
        for _ in range(700):
            h.update(buf)
        best = min(best, time.time() - t0)
    return round(best, 3)


def _run(code: str, cpus: int | None, timeout: int = 3600) -> str:
    env = dict(os.environ)
    env.update(
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        NUMEXPR_NUM_THREADS="1",
    )
    cmd = [sys.executable, "-c", code]
    if cpus is not None and os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env
    )
    return out.stdout + ("" if out.returncode == 0 else "\nSTDERR:\n" + out.stderr[-3000:])


def _result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{out[-3000:]}")


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    stage = "/dev/shm/bench_pq" if os.path.isdir("/dev/shm") else "/tmp/bench_pq"
    t0 = time.time()
    probe_pre = _host_probe()
    out = _run(_STAGER.format(repo=REPO, n_vecs=n_vecs, stage_dir=stage), None)
    if "STAGED" not in out:
        raise RuntimeError(f"staging failed:\n{out[-3000:]}")
    try:
        res = _result(
            _run(_CHILD.format(repo=REPO, cpus=cpus, stage_dir=stage), cpus)
        )
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    probe_post = _host_probe()
    build = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    summary = {
        "metric": "IVF-PQ serving: compressed codes + ADC vs full-precision re-rank",
        "build": build,
        "cpus": cpus,
        **res,
        "host_probe_pre": probe_pre,
        "host_probe_post": probe_post,
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, "BENCH", "pq_ab.json"), "w") as f:
        json.dump(summary, f, indent=2)
    import bench_scaling  # noqa: PLC0415 — same tools/ dir

    bench_scaling.regen_md()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
