#!/usr/bin/env python
"""Generate an sf1-scale slice of the documents/embeddings tables
(r11 verdict item 4): one decade of scale evidence beyond sf0.1 for
the bucketed dedup/ANN claims.

The driver's testdata stops at sf0.1 (5k docs / 2k embeddings) and is
read-only, so this writes a 10x slice — 50k docs / 20k embeddings —
to ``.scale/sf1/`` beside the repo (gitignored), with the SAME
schemas and per-row statistics as the sf0.1 tables:

* documents: word counts matching the sf0.1 length band (~44-577
  chars, mean ~297), the same lang mix (en 2x) and 20 uniform
  sources — but a WIDE per-lang vocabulary (2000 syllable-composed
  words per language) instead of the driver corpus's 31 shared
  words.  The 31-word soup is degenerate at scale: every doc pair
  shares most char-5-grams, so at 50k docs every LSH band bucket
  saturates and pair volume hits the cap ceiling everywhere
  (measured: 52.6k pairs at 5k docs -> 3.77M at 50k, 72x for 10x
  docs) — that measures the corpus, not the engine.  Realistic
  corpora have low background shingle overlap; the wide vocabulary
  restores that, so pair volume tracks the PLANTED duplicates;
* planted duplicate structure at sf0.1-like rates so pair volume
  scales linearly by construction: ~0.2% exact duplicates plus ~2%
  near-duplicates (~5% word mutations of an earlier doc) for the
  LSH/containment/edit-distance paths to find;
* embeddings: 64-dim float32 around 10 cluster centroids with the
  sf0.1 value range (+-0.45), labels near-uniform.

Because the vocabulary differs from the driver corpus, scaling
ratios are taken WITHIN the generator family: gen BOTH a 5k-doc
slice (sf0.1-scale) and a 50k-doc slice (sf1) and compare walls
between them.  The other 8 tables symlink to the sf0.1 originals so
the full check_oracle harness (which registers all 10 views) runs
unchanged against either slice.

Deterministic: one fixed numpy seed; re-running overwrites in place.

Usage:
    python tools/gen_scale_slice.py [out_dir] [n_docs] [n_emb]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
SEED = 20260816

LANG_WEIGHTS = {"en": 2.0, "zh": 1.0, "es": 1.0, "fr": 1.0, "de": 1.0}
EXACT_DUP_RATE = 0.002       # sf0.1: 8 dup pairs / 5000 docs
NEAR_DUP_RATE = 0.02
MUTATE_FRAC = 0.05           # words replaced in a near-dup


VOCAB_WORDS = 2000

# per-language phoneme inventories (distinct letter statistics per
# lang so language-conditioned features vary).  ~200 CV/CVC
# syllables per lang compose the vocabulary, so the char-5-gram
# space is tens of thousands wide and two unrelated documents share
# only incidental grams — the low-background-overlap regime real
# corpora sit in (a 20-syllable inventory measured true Jaccard
# ~0.5 between unrelated LONG docs: the gram space saturates).
_PHONEMES = {
    "en": ("b c d f g h j k l m n p r s t w".split(),
           "a e i o u ee oo".split()),
    "de": ("b d f g h k l m n p r s t v z sch".split(),
           "a e i o u au ei".split()),
    "es": ("b c d f g l m n p r s t v ll rr".split(),
           "a e i o u ue ia".split()),
    "fr": ("b c d f g j l m n p r s t v ch".split(),
           "a e i o u ou eau".split()),
    "zh": ("b c d g h j k l m n p q r s t x zh".split(),
           "a e i o u ao iu".split()),
}
N_SYLLABLES = 200


def lang_vocab(rng) -> dict[str, list[str]]:
    """2000 deterministic syllable-composed words per language."""
    out: dict[str, list[str]] = {}
    for lang in sorted(_PHONEMES):
        cons, vow = _PHONEMES[lang]
        syls: set[str] = set()
        while len(syls) < N_SYLLABLES:
            c = cons[int(rng.integers(0, len(cons)))]
            v = vow[int(rng.integers(0, len(vow)))]
            tail = (cons[int(rng.integers(0, len(cons)))]
                    if rng.random() < 0.5 else "")
            syls.add(c + v + tail)
        syl = sorted(syls)
        words: set[str] = set()
        while len(words) < VOCAB_WORDS:
            k = int(rng.integers(2, 5))
            words.add("".join(syl[int(j)] for j in
                              rng.integers(0, len(syl), size=k)))
        out[lang] = sorted(words)
    return out


def gen_documents(n_docs: int, rng) -> pa.Table:
    vocab = lang_vocab(rng)
    langs = sorted(LANG_WEIGHTS)
    p = np.array([LANG_WEIGHTS[l] for l in langs])
    p = p / p.sum()
    lang_idx = rng.choice(len(langs), size=n_docs, p=p)
    n_words = rng.integers(4, 51, size=n_docs)
    kinds = rng.random(n_docs)

    texts: list[str] = []
    doc_langs: list[str] = []
    for i in range(n_docs):
        lang = langs[lang_idx[i]]
        if i > 0 and kinds[i] < EXACT_DUP_RATE:
            j = int(rng.integers(0, i))
            texts.append(texts[j])
            doc_langs.append(doc_langs[j])
            continue
        if i > 0 and kinds[i] < EXACT_DUP_RATE + NEAR_DUP_RATE:
            j = int(rng.integers(0, i))
            words = texts[j].split(" ")
            wl = vocab[doc_langs[j]]
            n_mut = max(1, int(len(words) * MUTATE_FRAC))
            for k in rng.integers(0, len(words), size=n_mut):
                words[int(k)] = wl[int(rng.integers(0, len(wl)))]
            texts.append(" ".join(words))
            doc_langs.append(doc_langs[j])
            continue
        wl = vocab[lang]
        idx = rng.integers(0, len(wl), size=int(n_words[i]))
        texts.append(" ".join(wl[int(k)] for k in idx))
        doc_langs.append(lang)

    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n_docs)]
    return pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(doc_langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n_emb: int, rng) -> pa.Table:
    dim, n_labels = 64, 10
    centers = rng.normal(0.0, 0.12, size=(n_labels, dim))
    labels = rng.integers(0, n_labels, size=n_emb)
    vecs = (centers[labels]
            + rng.normal(0.0, 0.08, size=(n_emb, dim)))
    vecs = np.clip(vecs, -0.45, 0.45).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs),
                              pa.list_(pa.float32())),
        "label": pa.array([int(x) for x in labels], pa.int32()),
    })


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 \
        else os.path.join(ROOT, ".scale", "sf1")
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_emb = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(gen_documents(n_docs, rng),
                   os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(n_emb, rng),
                   os.path.join(out, "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    print(f"wrote {n_docs} docs / {n_emb} embeddings to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
