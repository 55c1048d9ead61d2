#!/usr/bin/env python
"""Train the default BoW vocabulary and save it as a package asset.

Counterpart of DBoW2's offline vocabulary creation (the reference ships a
pretrained ORBvoc.txt, k=10 L=6, trained on ~10k images — SURVEY §2.2).  Here
the corpus is ORB descriptors extracted from a few hundred synthetic value-
noise textures under random viewpoints; k=10 L=4 (~10k words) keeps the
artifact small while giving loop closing / relocalization enough vocabulary
resolution for typical sequences.

Usage: python scripts/train_vocab.py [n_textures] [out.npz]
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
from self_commit_orb_slam2_tpu.utils.synthetic import value_noise_texture


def main():
    n_tex = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "self_commit_orb_slam2_tpu", "assets", "vocab_synthetic.npz",
    )
    rng = np.random.default_rng(7)
    cfg = OrbConfig(n_features=512)
    ext = jax.jit(functools.partial(extract, config=cfg))

    descs = []
    t0 = time.time()
    for i in range(n_tex):
        tex = value_noise_texture(rng, size=320,
                                  sharp_features=int(rng.integers(60, 200)))
        feats = ext(jnp.asarray(tex))
        v = np.asarray(feats.valid)
        descs.append(np.asarray(feats.desc)[v])
        if (i + 1) % 50 == 0:
            print(f"{i+1}/{n_tex} textures, {sum(len(d) for d in descs)} descriptors,"
                  f" {time.time()-t0:.0f}s")
    corpus = np.concatenate(descs)
    print(f"training k=10 L=4 on {len(corpus)} descriptors ...")
    vocab = train_vocabulary(corpus, k=10, L=4, seed=0)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vocabulary(out, vocab)
    print(f"saved {vocab.n_words} words -> {out}"
          f" ({os.path.getsize(out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
