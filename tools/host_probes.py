"""Engine-free host-capacity probes for two-level scaling diagnosis.

When a two-level scaling number misses the 0.8 target, the FIRST question
is whether the host can even deliver 4x at that working set — these
probes run the job's hot kernel in plain multiprocessing (no Spark, no
JVM, no Arrow) at 2 and 8 processes:

    python tools/host_probes.py gemm        # semantic_dedup's tile GEMM shape
    python tools/host_probes.py gemm_strip  # the shipped strip-wise variant
    python tools/host_probes.py bpe         # bpe_encode's per-word merge loop
    python tools/host_probes.py normalize   # normalize_text's regex+NFC scan

Interpretation (both measured on this sandbox host, 2026-08-19):

* ``gemm`` — 6250x64 @ 64x6250 float64 tiles (312 MB output each,
  arithmetic intensity ~8 flop/byte): scales **0.34-0.49 efficiency
  across sessions** — two processes already saturate the shared DRAM
  channels. semantic_dedup measuring 0.72 whole-job therefore EXCEEDS
  its kernel's host ceiling; nothing engine-side serializes.
* ``bpe`` — dict-cached per-word BPE encode over a synthetic word
  stream: scales **0.80-0.97 efficiency** (0.86 in the variant that
  replays the real 250 MB scaling corpus) — the host is fine for this
  working set, which is how the original mapInPandas encode's 0.56 was
  indicted as an ENGINE problem (the pandas token-object conversion)
  and fixed with flat Arrow buffers (0.98 after).
* ``normalize`` — normalize_text's regex+NFC pipeline as pure per-doc
  Python (re.sub string reallocs): caps at **0.63 efficiency**
  (0.631-0.643 across 3 runs, 2026-08-19) — string-substitution realloc
  traffic saturates the shared allocator/DRAM path at 2 procs, the
  same ceiling class as the dedup job's narrow md5 stage. The shipped
  Spark stage measures 0.94 because JVM regexes + the vectorized Arrow
  ASCII scan keep the 90% majority out of per-row Python entirely.

The BASELINE.md scaling-evidence sections cite these numbers; re-run the
probes in the same session as any scaling bench you intend to compare
against (host capacity drifts with co-tenant load).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

# pin EVERY BLAS/threading backend to 1 thread before numpy loads — a
# multithreaded GEMM at 2 procs would already use all cores and make the
# 2-vs-8 comparison meaningless on MKL/BLIS/OpenMP-linked builds
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS",
           "BLIS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def _gemm_work(seed: int) -> float:
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.standard_normal((6250, 64))
    b = rng.standard_normal((64, 6250))
    s = 0.0
    for _ in range(4):
        s += float((a @ b)[0, 0])
    return s


def _gemm_strip_work(seed: int) -> float:
    # the shipped semantic_dedup tile shape: 512-row query strips, each
    # reduced to threshold flags while cache-resident — the full 312 MB
    # tile never exists (similarity._tile_drop_fn); measured ~1.2x
    # faster than _gemm_work WITH the compare included, same scaling
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.standard_normal((6250, 64))
    b = rng.standard_normal((64, 6250))
    tot = 0
    for _ in range(4):
        for i in range(0, 6250, 512):
            tot += int(((a[i : i + 512] @ b) >= 50.0).sum())
    return float(tot)


def _bpe_work(seed: int) -> int:
    # same cache-then-memcpy loop shape as operators/bpe.py enc_batches,
    # over a synthetic zipf-ish word stream (no repo imports: the probe
    # must measure the HOST, not the library)
    from array import array

    words = [f"w{i % 997}x{i % 31}" for i in range(200_000)]
    cache: dict[str, array] = {}
    out = array("i")
    n = 0
    for _ in range(10):
        for w in words:
            r = cache.get(w)
            if r is None:
                r = array("i", [ord(c) % 256 for c in w])
                cache[w] = r
            out.extend(r)
            if len(out) > 1 << 20:
                n += len(out)
                del out[:]
    return n + len(out)


def _normalize_work(seed: int) -> int:
    # normalize_text's per-byte shape with no engine: regex scans over
    # ~10 MB of ASCII-heavy text (10% of docs spiked non-ASCII, like the
    # scaling corpus), NFC only on the spiked minority, string realloc
    # per substitution — measures the host's string/alloc bandwidth
    # scaling, which is what the Spark stage contends on
    import re
    import unicodedata

    base = ("the quick brown fox jumps over the lazy dog " * 20 + "\r\n") * 8
    docs = [
        ("\ufeffCafe\u0301 \r\n" + base) if i % 10 == 0 else base
        for i in range(1500)
    ]
    crlf = re.compile(r"\r\n?")
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f\u200b\ufeff]")
    ws = re.compile(r"[ \t]+")
    edge = re.compile(r" *\n *")
    n = 0
    for d in docs:
        s = ctrl.sub("", crlf.sub("\n", d))
        if not s.isascii():
            s = unicodedata.normalize("NFC", s)
        s = edge.sub("\n", ws.sub(" ", s)).strip("\n ")
        n += len(s)
    return n


def _run(fn, procs: int, chunks: int = 8, reps: int = 3) -> float:
    walls = []
    for _ in range(reps):
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(fn, range(chunks))
            walls.append(time.perf_counter() - t0)
    return min(walls)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "gemm"
    fn = {"gemm": _gemm_work, "gemm_strip": _gemm_strip_work,
          "bpe": _bpe_work, "normalize": _normalize_work}[which]
    w2 = _run(fn, 2)
    w8 = _run(fn, 8)
    print(
        json.dumps(
            {
                "probe": which,
                "p2_wall_s": round(w2, 2),
                "p8_wall_s": round(w8, 2),
                "speedup": round(w2 / w8, 3),
                "efficiency": round(w2 / w8 / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
