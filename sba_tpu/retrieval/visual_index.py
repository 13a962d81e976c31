"""Inverted-file image retrieval index over vocab-tree visual words.

Capability parity with ref: src/retrieval/visual_index.h:61 (`VisualIndex`:
Add/Query with TF-IDF-weighted inverted file; the reference adds Hamming
embedding re-ranking — here the candidate list feeds geometric
verification downstream, which subsumes re-ranking for matching purposes)
and src/feature/matching.h:456 (`VocabTreeFeatureMatcher` retrieval-based
pair selection).

The word-frequency scoring is one sparse-vector dot product per query —
realized as a dense [num_words] histogram matmul against the indexed
corpus (num_words x num_images fits comfortably in HBM for SfM-scale
corpora; brute dense beats inverted lists on this hardware).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.retrieval.vocab_tree import VocabTree, quantize_descriptors


class VisualIndex:
    """TF-IDF retrieval index (ref: visual_index.h Add/Prepare/Query)."""

    def __init__(self, tree: VocabTree):
        self.tree = tree
        self._image_ids: List[int] = []
        self._histograms: List[np.ndarray] = []
        self._idf: Optional[np.ndarray] = None
        self._matrix: Optional[np.ndarray] = None
        self._words: Dict[int, np.ndarray] = {}
        self._geoms: Dict[int, np.ndarray] = {}

    def add_image(self, image_id: int, descriptors, keypoints=None) -> None:
        """keypoints [N, 4] (x, y, scale, orientation) enables
        vote-and-verify spatial re-ranking at query time
        (ref: visual_index.h stores FeatureGeometry per posting)."""
        words = np.asarray(quantize_descriptors(self.tree, descriptors))
        hist = np.bincount(words, minlength=self.tree.num_words) \
            .astype(np.float32)
        self._image_ids.append(image_id)
        self._histograms.append(hist)
        self._words[image_id] = words
        if keypoints is not None:
            self._geoms[image_id] = np.asarray(keypoints, np.float32)
        self._idf = None  # invalidate

    def prepare(self) -> None:
        """Finalize TF-IDF weights (ref: VisualIndex::Prepare)."""
        H = np.stack(self._histograms)  # [M, W]
        df = (H > 0).sum(0)
        m = len(self._image_ids)
        self._idf = np.log(m / np.maximum(df, 1)).astype(np.float32)
        tfidf = H * self._idf[None, :]
        norms = np.linalg.norm(tfidf, axis=1, keepdims=True)
        self._matrix = tfidf / np.maximum(norms, 1e-9)

    def query(self, descriptors, num_images: int = 10,
              exclude_image_id: Optional[int] = None,
              keypoints=None, num_verifications: int = 0
              ) -> List[Tuple[int, float]]:
        """-> [(image_id, score)] ranked by cosine TF-IDF similarity.

        With `keypoints` [N, 4] and num_verifications > 0, the top
        candidates are spatially re-ranked by vote-and-verify: the
        effective inlier count adds to the score
        (ref: visual_index.h:483 image_score.score += VoteAndVerify)."""
        if self._idf is None or self._matrix is None:
            self.prepare()
        words = np.asarray(quantize_descriptors(self.tree, descriptors))
        hist = np.bincount(words, minlength=self.tree.num_words) \
            .astype(np.float32)
        q = hist * self._idf
        q = q / max(np.linalg.norm(q), 1e-9)
        scores = self._matrix @ q  # [M]
        order = np.argsort(-scores)
        out = []
        for k in order:
            iid = self._image_ids[k]
            if exclude_image_id is not None and iid == exclude_image_id:
                continue
            out.append((iid, float(scores[k])))
            if len(out) >= max(num_images, num_verifications):
                break

        if num_verifications > 0 and keypoints is not None:
            from sba_tpu.retrieval.vote_and_verify import (
                vote_and_verify, word_matches,
            )

            reranked = []
            for iid, score in out[:num_verifications]:
                if iid in self._geoms:
                    g1, g2 = word_matches(words, np.asarray(keypoints),
                                          self._words[iid],
                                          self._geoms[iid])
                    if len(g1):
                        score += int(vote_and_verify(g1, g2))
                reranked.append((iid, score))
            reranked += out[num_verifications:]
            reranked.sort(key=lambda t: -t[1])
            out = reranked
        return out[:num_images]

    def num_images(self) -> int:
        return len(self._image_ids)


def vocab_tree_pairs(index: VisualIndex, queries: Dict[int, np.ndarray],
                     num_images: int = 10) -> np.ndarray:
    """Retrieval-based pair schedule: for each query image, its top
    retrieved partners (ref: matching.h:456 VocabTreeFeatureMatcher).
    Returns [M, 2] image-ID pairs (id1 < id2, deduped)."""
    pairs = set()
    for iid, desc in queries.items():
        for other, _score in index.query(desc, num_images,
                                         exclude_image_id=iid):
            pairs.add((min(iid, other), max(iid, other)))
    return np.asarray(sorted(pairs), np.int64).reshape(-1, 2)
