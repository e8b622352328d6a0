#!/usr/bin/env python3
"""End-to-end proof that the maxBucket guard and the oracles agree when a
block actually EXCEEDS the cap (at the standard scale factors no block comes
near 4096, so the driver gate never exercises this path).

Builds a corpus whose (lang='en', len_bucket) block holds 4200 docs — over
the qd4/qd6/qd8 cap — plus one near-dup pair in a small block, runs
graft.Verify on it, and replays the capped oracles with check_oracle's
comparator. Parity requires BOTH sides to drop the hot block and keep the
small-block pair.

Usage: python3 tools/check_cap_parity.py  (from the repo root)
"""
import os
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def build_corpus(d):
    rows = []
    # 4200 docs, identical word COUNT (same len_bucket) but distinct words
    # so they are not exact dups; every one lands in the same hot block
    for i in range(4200):
        text = f"hot{i} alpha beta gamma delta epsilon zeta eta"  # 8 words
        rows.append((i, text, "en", "hot", len(text)))
    # a small block (different word count) holding one near-dup pair
    a = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    b = a.replace("seven", "sevenx")
    rows.append((9000, a, "en", "small", len(a)))
    rows.append((9001, b, "en", "small", len(b)))
    rows.append((9002, "totally unrelated words with fifteen tokens in a very different "
                       "sentence shape here now", "en", "small", 40))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    # the checker registers views for every table; link the unused ones
    ref = "/root/testdata/sf0.001"
    for f in os.listdir(ref):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(ref, f), os.path.join(d, f))


def main():
    work = tempfile.mkdtemp(prefix="graft-cap-")
    sf_dir = os.path.join(work, "sf")
    out_dir = os.path.join(work, "out")
    os.makedirs(sf_dir)
    build_corpus(sf_dir)
    env = dict(os.environ,
               SPARK_GRAFT_CPUS="8",
               SPARK_GRAFT_ONLY="qd4_ngram_jaccard,qd6_dedup_clusters,qd8_cluster_survivors")
    print(f"[cap-parity] corpus at {sf_dir} (4200-doc hot block + near-dup pair)")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        env=env, capture_output=True, text=True)
    warned = "bucket caps dropped blocks" in r.stderr + r.stdout
    print(f"[cap-parity] Verify done (exit {r.returncode}); cap warning printed: {warned}")
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        sys.exit(1)
    if not warned:
        print("[cap-parity] FAIL: expected the Verify oversize warning")
        sys.exit(1)
    chk = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir, out_dir],
        capture_output=True, text=True)
    print(chk.stdout.strip())
    lines = [l for l in chk.stdout.splitlines() if l.startswith(("OK", "FAIL"))]
    relevant = [l for l in lines if any(q in l for q in ("qd4", "qd6", "qd8"))]
    ok = [l for l in relevant if l.startswith("OK")]
    if len(ok) == 3:
        print("[cap-parity] PASS: op and capped oracle agree with a hot block present")
    else:
        print("[cap-parity] FAIL")
        sys.exit(1)


if __name__ == "__main__":
    main()
