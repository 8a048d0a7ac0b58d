"""Precomputed CLIP text-embedding tables.

The reference runs the CLIP text tower *inside the train step* for every
batch (get_rel_emb, SGFN_MMG/model.py:221-255) — tokenizing and encoding
GT-triplet sentences on the fly.  The sentence vocabulary is finite (train
triplets + observed no-relation class pairs), so the TPU-native design
precomputes every needed embedding once, offline, and the train step reads
an (E, 512) tensor like any other input.

Three encoders:
  * HFCLIPTextEncoder — transformers' openai/clip-vit-base-patch32 text
    tower (the reference loads "ViT-B/32"); requires local weights
    (zero-egress environments must point at a downloaded snapshot);
  * HashTextEncoder — deterministic pseudo-embeddings (seeded from the
    sentence hash); lets the entire pipeline run and be tested without
    CLIP assets, with documented loss of semantic priors;
  * any callable list[str] -> (n, d) array.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from vlsat_tpu.clipsem.prompts import (
    no_relation_prompt,
    object_prompt,
    relation_prompt,
    triplet_prompt,
)

TextEncoder = Callable[[List[str]], np.ndarray]


class HashTextEncoder:
    """Deterministic stand-in encoder: unit-norm gaussian per sentence."""

    def __init__(self, dim: int = 512):
        self.dim = dim

    def __call__(self, sentences: List[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), np.float32)
        for i, s in enumerate(sentences):
            seed = int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "little")
            rng = np.random.RandomState(seed)
            v = rng.randn(self.dim).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


class HFCLIPTextEncoder:
    """transformers CLIP text tower (ViT-B/32 checkpoint)."""

    def __init__(self, model_name_or_path: str = "openai/clip-vit-base-patch32",
                 device: str = "cpu", batch_size: int = 64):
        import torch  # noqa
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer

        self.tok = CLIPTokenizer.from_pretrained(model_name_or_path)
        self.model = CLIPTextModelWithProjection.from_pretrained(model_name_or_path)
        self.model.eval().to(device)
        self.device = device
        self.batch_size = batch_size

    def __call__(self, sentences: List[str]) -> np.ndarray:
        import torch

        outs = []
        with torch.no_grad():
            for i in range(0, len(sentences), self.batch_size):
                chunk = sentences[i:i + self.batch_size]
                toks = self.tok(chunk, padding=True, truncation=True, max_length=77,
                                return_tensors="pt").to(self.device)
                emb = self.model(**toks).text_embeds
                outs.append(emb.cpu().float().numpy())
        return np.concatenate(outs)


def build_label_tables(class_names: Sequence[str], relation_names: Sequence[str],
                       encoder: TextEncoder):
    """Normalized text tables for the cosine classifiers
    (SGFN_MMG/model.py:209-219)."""
    obj = encoder([object_prompt(c) for c in class_names])
    rel = encoder([relation_prompt(r) for r in relation_names])
    obj = obj / np.linalg.norm(obj, axis=-1, keepdims=True)
    rel = rel / np.linalg.norm(rel, axis=-1, keepdims=True)
    return obj.astype(np.float32), rel.astype(np.float32)


class TripletTextCache:
    """Sentence -> raw CLIP embedding cache + per-edge lookup.

    Per-edge target = mean of the GT-rel sentence embeddings (raw, then
    normalized after the mean — reference order, model.py:247-253); the
    no-relation sentence for edges without GT.
    """

    def __init__(self, class_names: Sequence[str], relation_names: Sequence[str],
                 dim: int = 512):
        self.class_names = list(class_names)
        self.relation_names = list(relation_names)
        self.dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------ building
    def sentences_for_index(self, scenes) -> List[str]:
        """All sentences needed to cover a DatasetIndex's annotations."""
        needed = set()
        for ann in scenes:
            names = ann.objects
            ids = list(names)
            for r in ann.relationships:
                if r[0] in names and r[1] in names:
                    needed.add(triplet_prompt(names[r[0]], r[3], names[r[1]]))
            for a in ids:
                for b in ids:
                    if a != b:
                        needed.add(no_relation_prompt(names[a], names[b]))
        return sorted(needed)

    def build(self, sentences: List[str], encoder: TextEncoder) -> None:
        missing = [s for s in sentences if s not in self._cache]
        if missing:
            emb = encoder(missing)
            for s, e in zip(missing, emb):
                self._cache[s] = e.astype(np.float32)

    def save(self, path: str) -> None:
        keys = list(self._cache)
        np.savez_compressed(path, sentences=np.asarray(keys, dtype=object),
                            embeddings=np.stack([self._cache[k] for k in keys])
                            if keys else np.zeros((0, self.dim), np.float32))

    @classmethod
    def load(cls, path: str, class_names, relation_names) -> "TripletTextCache":
        z = np.load(path, allow_pickle=True)
        cache = cls(class_names, relation_names, dim=z["embeddings"].shape[-1]
                    if len(z["embeddings"]) else 512)
        for s, e in zip(z["sentences"], z["embeddings"]):
            cache._cache[str(s)] = e.astype(np.float32)
        return cache

    # ------------------------------------------------------------- lookup
    def __call__(self, gt_class: np.ndarray, gt_rels: np.ndarray,
                 edge_index: np.ndarray) -> np.ndarray:
        """(N,), (E, R), (E, 2) -> (E, dim) normalized targets."""
        e_cnt = len(edge_index)
        out = np.zeros((e_cnt, self.dim), np.float32)
        for e in range(e_cnt):
            sub = self.class_names[gt_class[edge_index[e, 0]]]
            obj = self.class_names[gt_class[edge_index[e, 1]]]
            rels = np.nonzero(gt_rels[e])[0]
            if len(rels) == 0:
                vecs = [self._lookup(no_relation_prompt(sub, obj))]
            else:
                vecs = [
                    self._lookup(triplet_prompt(sub, self.relation_names[r], obj))
                    for r in rels
                ]
            v = np.mean(vecs, axis=0)
            out[e] = v / max(np.linalg.norm(v), 1e-12)
        return out

    def _lookup(self, sentence: str) -> np.ndarray:
        if sentence not in self._cache:
            raise KeyError(
                f"sentence not in triplet text cache: {sentence!r} — "
                "rebuild the cache over the training index"
            )
        return self._cache[sentence]
