#!/usr/bin/env python
"""Train the default BoW vocabulary and save it as a package asset.

Counterpart of DBoW2's offline vocabulary creation (the reference ships a
pretrained ORBvoc.txt, k=10 L=6 ~1M leaves, trained on ~10k images — SURVEY
§2.2).  The corpus is ORB descriptors extracted from the HELD-OUT texture
families in utils/synthetic.py (voronoi / stripe-blob / warped-checker /
halftone, with randomized gamma/contrast/brightness/vignette) — a corpus
DISJOINT from the value-noise family every test and bench scene is built
from, so passing the loop/reloc/retrieval tests with this vocabulary proves
place recognition generalizes beyond its training distribution (the point
of ORBvoc — DBoW2 TemplatedVocabulary.h:1338).  The default k=10 L=6 (the
ORBvoc geometry) yields >=10^5 words, which the sparse (word id, weight)
database scores at the same cost as a small vocabulary.

Usage: python scripts/train_vocab.py [n_textures] [out.npz] [--small]
  --small: k=10 L=4 (~10k words) quick variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np

from self_commit_orb_slam2_tpu.ops.bow import save_vocabulary, train_vocabulary
from self_commit_orb_slam2_tpu.ops.orb.extractor import OrbConfig, extract
from self_commit_orb_slam2_tpu.utils.synthetic import (
    CORPUS_FAMILIES, corpus_texture,
)


def main():
    small = "--small" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_tex = int(args[0]) if args else (200 if small else 420)
    out = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "self_commit_orb_slam2_tpu", "assets", "vocab_synthetic.npz",
    )
    rng = np.random.default_rng(7)
    # 640x640 textures at a 2500-feature budget: ~2.4k descriptors per
    # texture -> ~1M descriptors at the default 420 textures
    size, nfeat = (320, 512) if small else (640, 2500)
    cfg = OrbConfig(n_features=nfeat)
    ext = jax.jit(functools.partial(extract, config=cfg))

    descs, doc_ids = [], []
    t0 = time.time()
    for i in range(n_tex):
        tex = corpus_texture(rng, size=size)
        feats = ext(jnp.asarray(tex))
        v = np.asarray(feats.valid)
        d = np.asarray(feats.desc)[v]
        descs.append(d)
        doc_ids.append(np.full(len(d), i, np.int32))
        if (i + 1) % 50 == 0:
            print(f"{i+1}/{n_tex} textures, {sum(len(d) for d in descs)} "
                  f"descriptors, {time.time()-t0:.0f}s", flush=True)
    corpus = np.concatenate(descs)
    docs = np.concatenate(doc_ids)
    k, L, levelsup = (10, 4, 2) if small else (10, 6, 4)
    # levelsup: mid-level node granularity for SearchByBoW constraints —
    # L - levelsup = 2 keeps ~100 nodes, matching the reference's
    # transform(.., 4) on the L=6 ORBvoc (Frame.cc:889)
    print(f"training k={k} L={L} on {len(corpus)} descriptors ...", flush=True)
    t1 = time.time()
    vocab = train_vocabulary(corpus, k=k, L=L, seed=0,
                             weight_doc_ids=docs, levelsup=levelsup)
    print(f"trained in {time.time()-t1:.0f}s", flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vocabulary(
        out, vocab,
        provenance=(f"held-out corpus: families={','.join(CORPUS_FAMILIES)} "
                    f"n_textures={n_tex} size={size} nfeat={nfeat} "
                    "augment=gamma/contrast/brightness/vignette "
                    "(value_noise test family EXCLUDED)"))
    print(f"saved {vocab.n_words} words -> {out}"
          f" ({os.path.getsize(out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
