"""CLIP-adapter training (reference clip_adapter/main.py + dataset.py).

Trains the residual AdapterModel on per-instance multi-view CLIP features
against instance class labels with label-smoothed cross-entropy (eps 0.2),
SGD(1e-2, wd 5e-4) + cosine annealing over all steps, keeping the best
val top-1 — the checkpoint that ships frozen inside the flagship model.

The shipped reference trainer is broken as-is (passes kwargs AdapterModel
doesn't accept, main.py:39, and treats raw adapter features as logits);
the *intended* objective per clip_adapter/test.py is cosine classification
against CLIP text class weights, which is what this implements.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlsat_tpu.models.layers import AdapterModel

_LINE = re.compile(
    r"Scene:\s*(?P<scene>\S+)\s+Instance:\s*(?P<instance>\S+)\s+"
    r"Label:\s*(?P<label>.+?)\s+Quanlity:\s*(?P<quality>\S+)")


@dataclass
class MultiViewRecord:
    scene: str
    instance: str
    label: str
    quality: str

    def feature_path(self, root: str, mode: str = "origin_view_mean") -> str:
        return (f"{root}/{self.scene}/multi_view/"
                f"instance_{self.instance}_class_{self.label}_{mode}.npy")


def parse_quality_list(path: str) -> List[MultiViewRecord]:
    """Parse the reference's ``*_all_quanlity.txt`` listing
    (clip_adapter/dataset.py:26-39)."""
    out = []
    with open(path) as f:
        for line in f:
            m = _LINE.search(line)
            if m:
                out.append(MultiViewRecord(**m.groupdict()))
    return out


_PC_ANGLES = (0, 30, -30, 60, -60)


@dataclass
class MultiViewPCRecord:
    """One sample of the 5-angle rendered-point-cloud adapter dataset
    (reference ``MultiViewPCDataset``, clip_adapter/dataset.py:46-97):
    five view images of one instance + its class-label index."""

    paths: Tuple[str, ...]
    label: int


def parse_pc_data_list(data_list_path: str, labels: Sequence[str],
                       root_path: str = "") -> List[MultiViewPCRecord]:
    """Parse the quality-list file into 5-angle rendered-image records
    (clip_adapter/dataset.py:70-90): per line, image paths
    ``{root}/{scene}/multi_view_pc/{instance}_{label}_{angle}.jpg`` for
    angles (0, 30, -30, 60, -60), label resolved against ``labels``."""
    records: List[MultiViewPCRecord] = []
    with open(data_list_path) as f:
        for line in f:
            if not line.strip():
                continue
            items = line.strip().split(":")
            scene_id = items[1].split(" ")[0]
            instance_id = items[2].split(" ")[0]
            label_name = " ".join(items[3].split(" ")[0:-1])
            paths = tuple(
                f"{root_path}/{scene_id}/multi_view_pc/"
                f"{instance_id}_{label_name}_{angle}.jpg"
                for angle in _PC_ANGLES)
            records.append(MultiViewPCRecord(paths=paths,
                                             label=labels.index(label_name)))
    return records


def load_pc_views(record: MultiViewPCRecord, size: int = 224) -> np.ndarray:
    """Load one record's 5 view images as a (5, 3, size, size) float32
    array in [0, 1] — the resize(224)+RGB+ToTensor transform of the
    reference dataset (clip_adapter/dataset.py:56-61,91-97)."""
    from PIL import Image

    views = []
    for path in record.paths:
        img = Image.open(path).resize((size, size)).convert("RGB")
        arr = np.asarray(img, dtype=np.float32) / 255.0
        views.append(arr.transpose(2, 0, 1))
    return np.stack(views, axis=0)


def smooth_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         eps: float = 0.2) -> jnp.ndarray:
    """Label-smoothed CE (clip_adapter/main.py:20-29)."""
    n = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n)
    target = one_hot * (1 - eps) + (1 - one_hot) * eps / (n - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(target * logp).sum(-1).mean()


def _logits(adapter: AdapterModel, params, feats, text_table, scale):
    out = adapter.apply({"params": params}, feats)
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)
    return scale * out @ text_table.T


def topk_ranks(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    gt = np.take_along_axis(logits, labels[:, None], axis=-1)
    return (logits > gt).sum(-1)  # 0-based rank


def train_adapter(
    train_feats: np.ndarray, train_labels: np.ndarray,
    val_feats: np.ndarray, val_labels: np.ndarray,
    text_table: np.ndarray,
    alpha: float = 0.6,
    lr: float = 1e-2,
    weight_decay: float = 5e-4,
    epochs: int = 20,
    batch_size: int = 32,
    eps: float = 0.2,
    seed: int = 0,
    logit_scale: float = float(np.exp(np.log(1 / 0.07))),
):
    """Returns (best_params, best_top1)."""
    adapter = AdapterModel(alpha=alpha)
    params = adapter.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, train_feats.shape[-1])))["params"]
    steps_per_epoch = max(1, len(train_feats) // batch_size)
    sched = optax.cosine_decay_schedule(lr, steps_per_epoch * epochs)
    tx = optax.chain(optax.add_decayed_weights(weight_decay), optax.sgd(sched))
    opt_state = tx.init(params)
    table = jnp.asarray(text_table)

    @jax.jit
    def step(params, opt_state, feats, labels):
        def loss_fn(p):
            return smooth_cross_entropy(
                _logits(adapter, p, feats, table, logit_scale), labels, eps)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def infer(params, feats):
        return _logits(adapter, params, feats, table, logit_scale)

    rng = np.random.RandomState(seed)
    best_params, best_top1 = params, -1.0
    for _ in range(epochs):
        order = rng.permutation(len(train_feats))
        for i in range(steps_per_epoch):
            sel = order[i * batch_size:(i + 1) * batch_size]
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(train_feats[sel]),
                jnp.asarray(train_labels[sel]))
        ranks = topk_ranks(np.asarray(infer(params, jnp.asarray(val_feats))),
                           val_labels)
        top1 = 100.0 * (ranks < 1).mean()
        if top1 > best_top1:
            best_top1, best_params = top1, jax.tree.map(np.asarray, params)
    return best_params, best_top1


def zero_shot_eval(feats: np.ndarray, labels: np.ndarray,
                   text_table: np.ndarray,
                   params=None, alpha: float = 0.5) -> dict:
    """clip_adapter/test.py: (adapted) feature vs text weights top-k."""
    f = feats / np.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
    if params is not None:
        f = np.asarray(AdapterModel(alpha=alpha).apply({"params": params},
                                                       jnp.asarray(feats)))
        f = f / np.linalg.norm(f, axis=-1, keepdims=True).clip(1e-12)
    ranks = topk_ranks(f @ text_table.T, labels)
    return {f"top{k}": 100.0 * (ranks < k).mean() for k in (1, 5, 10)}
