"""Adversarial-input oracle gate: run the WHOLE contract (queries() +
extra_queries() vs their DuckDB oracles, via tools/compare_oracle.py)
against a hostile randomized documents/embeddings table.

The driver's correctness gate and the local compare both run on the
fixed synthetic corpus, whose text is benign; a Spark/DuckDB semantic
divergence that only shows on nasty content (empty strings, multi-space
runs, CRLF/controls/NFD/fullwidth byte forms, 500x word repeats,
whole-doc duplicates, shared spans/lines, PII shapes, zero / duplicate /
antipodal embeddings, top-k ties) would be invisible there. This tool
regenerates only the two free-content tables — schema-identical to the
real ones (documents: doc_id BIGINT, text, lang, source, n_chars;
embeddings: vec_id BIGINT, embedding FLOAT[64], label INT) — symlinks
the TPC-H-ish tables from a base sf dir, and exit-codes like
compare_oracle (non-zero on any value mismatch).

    python tools/fuzz_oracle.py [seed] [base_sf_dir]

Deterministic per seed. Used ad hoc (several seeds) rather than in the
suite: one full pass is ~5 min of Spark+DuckDB work.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = ["en", "de", "fr", "es", "zh"]
WORDS = (
    "the of and to in data model token spark corpus word line text "
    "alpha beta gamma delta epsilon zeta eta theta"
).split()

NASTY_SNIPPETS = [
    "",                                   # empty doc
    " ",                                  # single space (one empty-ish token)
    "x",                                  # single char
    "a  b   c",                           # multi-space runs -> empty tokens
    " leading and trailing ",             # edge spaces
    "line one\r\nline two\rline three",   # CRLF / lone CR
    "tab\there and\x07bell and\x00nul",   # C0 controls
    "﻿BOM start ​zero width",   # BOM / ZWSP
    "Café decomposed Å angstrom",  # NFD + singleton
    "ＦＵＬＬｗｉｄｔｈ ｆｏｒｍｓ",       # fullwidth (NFKC-only folds)
    "emoji \U0001f469‍\U0001f4bb keep zwj",  # ZWJ sequence
    "reach me at bob@example.com or +1-555-123-4567 today",  # PII shapes
    "ssn 123-45-6789 card 4111 1111 1111 1111",
    "{ \"json\": true } lorem ipsum dolor",  # clean_lines banned content
    "buy now!!! $$$ %%% @@@ ###",            # punct-heavy
    "1 22 333 4444 55555 666666 7777777",    # digit tokens
]


def _doc_text(rng: random.Random) -> str:
    n = rng.randrange(0, 60)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def build_documents(seed: int):
    rng = random.Random(seed)
    rows = []
    did = 0

    def add(text: str):
        nonlocal did
        lang = rng.choice(LANGS)
        # skewed sources incl. a 1-doc tail source (source_quota edge)
        source = f"src{min(rng.randrange(20), rng.randrange(20))}" if did % 97 else "srcTINY"
        rows.append((did, text, lang, source, len(text)))
        did += 1

    for s in NASTY_SNIPPETS:
        add(s)
    for _ in range(140):
        add(_doc_text(rng))
    # repetition torture: one word 500x, a 7-gram repeated 40x
    add("spam " * 499 + "spam")
    pat = _doc_text(rng)[:40] or "a b c d e f g"
    add(" ".join([pat] * 40))
    # whole-doc duplicates and near-duplicates (minhash/simhash/exact)
    base = _doc_text(rng) or "base doc text"
    for _ in range(3):
        add(base)
    add(base + " tail")
    add("head " + base)
    # shared span embedded in distinct docs (span_dedup)
    span = " ".join(rng.choice(WORDS) for _ in range(30))
    for _ in range(3):
        add(f"{_doc_text(rng)} {span} {_doc_text(rng)}")
    # shared lines across docs (line_dedup) + blank separator lines
    shared = "this exact line recurs across documents."
    for _ in range(4):
        add(f"{_doc_text(rng)}\n{shared}\n\n{_doc_text(rng)}")
    return rows


def build_embeddings(seed: int):
    rng = random.Random(seed + 1)
    rows = []
    vid = 0

    def addv(vec):
        nonlocal vid
        rows.append((vid, [float(x) for x in vec], vid % 10))
        vid += 1

    def rand_vec():
        return [rng.gauss(0, 1) for _ in range(64)]

    for _ in range(180):
        addv(rand_vec())
    addv([0.0] * 64)                      # zero vector (degenerate norm)
    addv([1e-30] * 64)                    # denormal-ish tiny
    addv([1e18] * 64)                     # huge but finite in float32
    base = rand_vec()
    addv(base)
    addv(base)                            # exact duplicate -> top-k tie
    addv([-x for x in base])              # antipodal
    addv([x * (1 + 1e-7) for x in base])  # near-duplicate
    one_hot = [0.0] * 64
    one_hot[7] = 1.0
    addv(one_hot)
    return rows


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    base_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    out_dir = f"/tmp/gfg_fuzz_sf_seed{seed}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        os.symlink(f"{base_sf}/{t}.parquet", f"{out_dir}/{t}.parquet")

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = build_documents(seed)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )
    embs = build_embeddings(seed)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in embs], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in embs], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in embs], pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )
    print(f"fuzz corpus (seed {seed}): {len(docs)} docs, {len(embs)} vecs "
          f"-> {out_dir}")
    rc = subprocess.call(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "compare_oracle.py"),
         out_dir] + sys.argv[3:]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
