"""Bag-of-binary-words place recognition, TPU-first.

Replaces the reference's vendored DBoW2 (Thirdparty/DBoW2, SURVEY §2.2):

  * Vocabulary: hierarchical k-medoids tree over 256-bit ORB descriptors
    (k branches, L levels — the shipped ORBvoc.txt is k=10 L=6).  Training
    is offline host-side (binary k-majority k-means); the tree is stored as
    flat arrays (node descriptors + children) so lookup is batched gathers.
  * transform(): all N descriptors descend the tree in parallel (L gather +
    Hamming-argmin steps) -> word ids + mid-level node ids (the reference's
    FeatureVector at levelsup=4, used to constrain SearchByBoW).
  * Scoring: instead of DBoW2's inverted file + per-entry accumulation
    (TemplatedVocabulary/ScoringObject L1 metric), frames become dense
    L1-normalized TF-IDF vectors and database scoring is ONE matrix-vector
    product over all keyframes — the MXU-native formulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """Flat hierarchical vocabulary.

    node_desc:     [n_nodes, 8] uint32 cluster-center descriptors
    node_children: [n_internal, k] int32 (index into node arrays; -1 = none)
    is_leaf:       [n_nodes] bool
    word_id:       [n_nodes] int32 (-1 for internal nodes)
    word_weight:   [n_words] float32 IDF weights
    depth_of:      level of each node
    k, L:          branching factor / leaf depth
    """

    node_desc: jnp.ndarray
    node_children: jnp.ndarray
    word_id: jnp.ndarray
    word_weight: jnp.ndarray
    k: int
    L: int
    n_words: int
    levelsup: int = 2  # node level used for matching constraints (from leaf)
    # [n_nodes, k, 8] uint32: node i's CHILDREN's descriptors, contiguous.
    # The tree descent then gathers ONE k*8-lane row per query per level
    # instead of k separate 8-lane rows (random 8-element gathers are the
    # slowest primitive on TPU); built once by _with_child_desc.
    child_desc: jnp.ndarray | None = None


_POP_LUT = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _hamming_table(descs_u8: np.ndarray, centers_u8: np.ndarray,
                   chunk: int = 1 << 16) -> np.ndarray:
    """[M, k] Hamming distances, chunked byte-LUT popcount (no [M, k, 256]
    unpack — at vocabulary-training scale (10^6 descriptors) that would be
    gigabytes per k-means iteration)."""
    M, k = len(descs_u8), len(centers_u8)
    out = np.empty((M, k), np.int32)
    for s in range(0, M, chunk):
        x = descs_u8[s : s + chunk, None, :] ^ centers_u8[None, :, :]
        out[s : s + chunk] = _POP_LUT[x].sum(-1, dtype=np.int32)
    return out


def _kmajority(descs: np.ndarray, k: int, rng, iters: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Binary k-means (k-majority vote) on [M, 8] uint32 descriptors."""
    M = len(descs)
    k = min(k, M)
    centers = descs[rng.choice(M, k, replace=False)]
    du8 = np.ascontiguousarray(descs).view(np.uint8).reshape(M, 32)
    assign = np.zeros(M, np.int64)
    for _ in range(iters):
        cu8 = np.ascontiguousarray(centers).view(np.uint8).reshape(k, 32)
        d = _hamming_table(du8, cu8)
        new_assign = np.argmin(d, axis=1)
        if np.array_equal(new_assign, assign):
            assign = new_assign
            break
        assign = new_assign
        new_centers = []
        for c in range(k):
            sel = du8[assign == c]
            if len(sel) == 0:
                new_centers.append(centers[c])
                continue
            maj = (np.unpackbits(sel, axis=-1).mean(0) >= 0.5).astype(np.uint8)
            new_centers.append(np.packbits(maj).view(np.uint32))
        centers = np.stack(new_centers)
    cu8 = np.ascontiguousarray(centers).view(np.uint8).reshape(k, 32)
    assign = np.argmin(_hamming_table(du8, cu8), axis=1)
    return centers, assign


def train_vocabulary(descriptors: np.ndarray, k: int = 10, L: int = 4,
                     seed: int = 0, weight_descs: np.ndarray | None = None,
                     weight_doc_ids: np.ndarray | None = None,
                     levelsup: int = 2) -> Vocabulary:
    """Train the tree host-side (offline, like DBoW2's create()).

    descriptors: [M, 8] uint32 training set.  IDF weights come from
    `weight_descs` (defaults to the training set) as in
    TemplatedVocabulary::setNodeWeights; when `weight_doc_ids` [M] is given,
    document frequency counts distinct source images per word (the DBoW2
    definition) instead of descriptor occurrences.
    """
    rng = np.random.default_rng(seed)
    node_desc = [np.zeros(8, np.uint32)]  # root (never compared against)
    children: list[list[int]] = [[]]
    levels = [0]

    def build(node_id: int, descs: np.ndarray, level: int):
        if level == L or len(descs) < 2 * k:
            return
        centers, assign = _kmajority(descs, k, rng)
        for c in range(len(centers)):
            child_id = len(node_desc)
            node_desc.append(centers[c])
            children.append([])
            levels.append(level + 1)
            children[node_id].append(child_id)
            sub = descs[assign == c]
            if len(sub):
                build(child_id, sub, level + 1)

    build(0, descriptors.astype(np.uint32), 0)

    n_nodes = len(node_desc)
    is_leaf = np.array([len(children[i]) == 0 and i != 0 for i in range(n_nodes)])
    word_id = np.full(n_nodes, -1, np.int32)
    word_id[is_leaf] = np.arange(is_leaf.sum(), dtype=np.int32)
    n_words = int(is_leaf.sum())

    child_arr = np.full((n_nodes, k), -1, np.int32)
    for i, ch in enumerate(children):
        child_arr[i, : len(ch)] = ch

    vocab = Vocabulary(
        node_desc=jnp.asarray(np.stack(node_desc)),
        node_children=jnp.asarray(child_arr),
        word_id=jnp.asarray(word_id),
        word_weight=jnp.ones(max(n_words, 1), jnp.float32),
        k=k, L=L, n_words=n_words, levelsup=levelsup,
    )
    # IDF weights (TemplatedVocabulary.h: weight = log(N / Ni))
    wd = weight_descs if weight_descs is not None else descriptors
    words_np = []
    CH = 1 << 17  # chunked: the descent gathers [M, k, 8] temporaries
    for s in range(0, len(wd), CH):
        w, _ = transform(vocab, jnp.asarray(wd[s : s + CH].astype(np.uint32)),
                         jnp.ones(min(CH, len(wd) - s), bool))
        words_np.append(np.asarray(w))
    words = np.concatenate(words_np) if words_np else np.zeros(0, np.int32)
    if weight_doc_ids is not None:
        # document frequency over distinct source images (DBoW2 semantics)
        docs = np.asarray(weight_doc_ids)[: len(words)]
        n_docs = max(int(docs.max()) + 1, 1)
        ok = words >= 0
        pairs = np.unique(words[ok].astype(np.int64) * n_docs + docs[ok])
        counts = np.bincount(pairs // n_docs,
                             minlength=n_words).astype(np.float64)
    else:
        counts = np.bincount(words[words >= 0], minlength=n_words).astype(np.float64)
        n_docs = max(len(wd), 1)
    idf = np.log(n_docs / np.maximum(counts, 1.0)).astype(np.float32)
    return _with_child_desc(
        vocab._replace(word_weight=jnp.asarray(np.maximum(idf, 1e-3))))


def _with_child_desc(vocab: Vocabulary) -> Vocabulary:
    """Precompute the contiguous [n_nodes, k, 8] child-descriptor table
    (host-side numpy, once per load/train)."""
    ch = np.asarray(vocab.node_children)
    nd = np.asarray(vocab.node_desc)
    cd = nd[np.clip(ch, 0, len(nd) - 1)]          # [n_nodes, k, 8]
    return vocab._replace(child_desc=jnp.asarray(cd))


def transform(vocab: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Batched tree descent: [N, 8] descriptors -> (word ids [N], node ids [N]).

    node ids are at `levelsup` levels above the leaves (reference
    FeatureVector with levelsup=4 from the root of a 6-level tree; here
    measured from the leaf for robustness to variable-depth branches).
    Returns -1 for invalid descriptors.
    """
    n = desc.shape[0]
    k = vocab.node_children.shape[1]
    cur = jnp.zeros(n, jnp.int32)  # root
    mid = jnp.zeros(n, jnp.int32)
    kiota = jnp.arange(k, dtype=jnp.int32)
    for level in range(vocab.L):
        ch = vocab.node_children[cur]  # [N, k] (one row gather per query)
        has_child = ch >= 0
        if vocab.child_desc is not None:
            cdesc = vocab.child_desc[cur]  # [N, k, 8]: ONE contiguous row
        else:
            ch_safe = jnp.clip(ch, 0, vocab.node_desc.shape[0] - 1)
            cdesc = vocab.node_desc[ch_safe]  # [N, k, 8]: k scattered rows
        x = jnp.bitwise_xor(desc[:, None, :], cdesc)
        dist = jnp.sum(jax.lax.population_count(x), axis=-1)
        dist = jnp.where(has_child, dist, 100_000)
        best = jnp.argmin(dist, axis=1)
        # one-hot reduce (a lane-axis take_along_axis scalarizes on TPU)
        nxt = jnp.sum(jnp.where(kiota[None, :] == best[:, None], ch, 0), axis=1)
        # stop at nodes with no children (variable-depth branches)
        stopped = ~jnp.any(has_child, axis=1)
        cur = jnp.where(stopped, cur, nxt)
        if level == max(vocab.L - 1 - vocab.levelsup, 0):
            mid = cur
    words = vocab.word_id[cur]
    words = jnp.where(valid, words, -1)
    mid = jnp.where(valid, mid, -1)
    return words, mid


def bow_vector(vocab: Vocabulary, words: jnp.ndarray) -> jnp.ndarray:
    """Dense L1-normalized TF-IDF vector [n_words] from word ids [N]."""
    w = jnp.zeros(vocab.n_words + 1, jnp.float32)
    idx = jnp.where(words >= 0, words, vocab.n_words)
    w = w.at[idx].add(1.0, mode="drop")
    v = w[: vocab.n_words] * vocab.word_weight
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def save_vocabulary(path: str, vocab: Vocabulary,
                    provenance: str = "") -> None:
    """`provenance` records the training-corpus description (texture
    families, counts) so tests can assert the shipped vocabulary was trained
    on a corpus disjoint from the test scenes."""
    np.savez_compressed(
        path,
        node_desc=np.asarray(vocab.node_desc),
        node_children=np.asarray(vocab.node_children),
        word_id=np.asarray(vocab.word_id),
        word_weight=np.asarray(vocab.word_weight),
        meta=np.array([vocab.k, vocab.L, vocab.n_words, vocab.levelsup]),
        provenance=np.array(provenance),
    )


def vocabulary_provenance(path: str) -> str:
    """Training-corpus description stored by save_vocabulary ('' if absent)."""
    with np.load(path) as z:
        return str(z["provenance"]) if "provenance" in z else ""


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    k, L, n_words, levelsup = (int(x) for x in z["meta"])
    return _with_child_desc(Vocabulary(
        node_desc=jnp.asarray(z["node_desc"]),
        node_children=jnp.asarray(z["node_children"]),
        word_id=jnp.asarray(z["word_id"]),
        word_weight=jnp.asarray(z["word_weight"]),
        k=k, L=L, n_words=n_words, levelsup=levelsup,
    ))


def l1_score(v: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of query v [W] vs database rows [K, W]:
    s = 1 - 0.5 * sum|v - w| in [0, 1] (ScoringObject.cpp L1Scoring)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - v[None, :]), axis=-1)


# ---------------------------------------------------------------- sparse path
# A dense [K, W] database caps the vocabulary at a few thousand words; the
# reference's ORBvoc is k=10 L=6 (~1M leaves).  The sparse form stores each
# frame's TOP-T distinct (word id, weight) pairs — memory is O(K*T),
# independent of W, so 10^5..10^6-word vocabularies cost the same as small
# ones.  For two L1-normalized non-negative vectors,
#     1 - 0.5*sum|v - w|  ==  sum_i min(v_i, w_i)  over shared words,
# which the TPU computes as one [T, T] id-match masked min-sum per row.


def sparse_bow(vocab: Vocabulary, words: jnp.ndarray, T: int):
    """[N] word ids -> (ids [T], weights [T]) sparse L1-normalized TF-IDF.
    ids are -1 padded; jit-safe (static T).

    Normalization runs over ALL distinct words first, then the TOP-T entries
    BY WEIGHT are kept (not the T smallest ids — a frame with more than T
    distinct words would otherwise silently drop its high-id words).  With
    <= T distinct words the result equals the dense vector exactly; beyond
    that the lowest-weight words are dropped, so sparse_l1_score is a tight
    lower bound of the dense score."""
    N = words.shape[0]
    ids, counts = jnp.unique(
        jnp.where(words >= 0, words, jnp.int32(1 << 30)),
        size=N, fill_value=jnp.int32(1 << 30), return_counts=True,
    )
    ok = ids < (1 << 30)
    vals = jnp.where(
        ok, counts.astype(jnp.float32)
        * vocab.word_weight[jnp.clip(ids, 0, vocab.n_words - 1)], 0.0)
    vals = vals / jnp.maximum(jnp.sum(vals), 1e-9)
    k = min(T, N)
    top_v, top_i = jax.lax.top_k(vals, k)
    top_ids = jnp.where(top_v > 0, ids[top_i], jnp.int32(1 << 30))
    if T > N:
        top_ids = jnp.pad(top_ids, (0, T - N), constant_values=1 << 30)
        top_v = jnp.pad(top_v, (0, T - N))
    # sort by word id so downstream id-match joins see a canonical order
    order = jnp.argsort(top_ids)
    top_ids, top_v = top_ids[order], top_v[order]
    ok_t = top_ids < (1 << 30)
    return (jnp.where(ok_t, top_ids, -1).astype(jnp.int32),
            jnp.where(ok_t, top_v, 0.0))


def sparse_l1_score(q_ids: jnp.ndarray, q_vals: jnp.ndarray,
                    db_ids: jnp.ndarray, db_vals: jnp.ndarray) -> jnp.ndarray:
    """Query (ids [T], vals [T]) vs database rows (ids [K, T], vals [K, T]):
    s[k] = sum over shared words of min(q, w) — identical to l1_score on the
    densified vectors."""
    eq = (q_ids[None, :, None] == db_ids[:, None, :]) & (q_ids >= 0)[None, :, None]
    mins = jnp.minimum(q_vals[None, :, None], db_vals[:, None, :])
    return jnp.sum(jnp.where(eq, mins, 0.0), axis=(1, 2))


def sparse_common_words(q_ids: jnp.ndarray, db_ids: jnp.ndarray) -> jnp.ndarray:
    """[K] count of distinct shared words (KeyFrameDatabase share-word
    filter, reference KeyFrameDatabase.cc:104-160)."""
    eq = (q_ids[None, :, None] == db_ids[:, None, :]) & (q_ids >= 0)[None, :, None]
    return jnp.sum(jnp.any(eq, axis=2), axis=1).astype(jnp.int32)
