"""PyTorch-CPU baseline for bench.py's workload.

A compact torch implementation of the same dual-branch MMG-Net eval
forward (architecture per SURVEY.md §2.2/§2.3), processing scenes the way
the reference does: nodes of all scenes concatenated, per-scene
block-diagonal attention masks built in a Python loop, torch index_select /
scatter_reduce for the GNN gather/scatter.  Measures scenes/sec on CPU and
writes bench_baseline.json, which bench.py reads to compute vs_baseline.

Run:  python tools/bench_torch_baseline.py
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

C_OBJ, C_REL, D = 160, 26, 512
HEADS, DEPTH, D_ATT = 8, 2, 256


class PointNet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = nn.Linear(cin, 64)
        self.c2 = nn.Linear(64, 128)
        self.c3 = nn.Linear(128, cout)

    def forward(self, x):  # (N, P, C)
        x = F.relu(self.c1(x))
        x = F.relu(self.c2(x))
        x = F.relu(self.c3(x))
        return x.max(dim=-2).values


class MHA(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h, self.dk = h, d // h
        self.q = nn.Linear(d, d)
        self.k = nn.Linear(d, d)
        self.v = nn.Linear(d, d)
        self.o = nn.Linear(d, d)
        self.ln = nn.LayerNorm(d)

    def forward(self, q, k, v, bias=None, mask=None):
        B, Nq, d = q.shape
        Nk = k.shape[1]
        qh = self.q(q).view(B, Nq, self.h, self.dk).permute(0, 2, 1, 3)
        kh = self.k(k).view(B, Nk, self.h, self.dk).permute(0, 2, 3, 1)
        vh = self.v(v).view(B, Nk, self.h, self.dk).permute(0, 2, 1, 3)
        att = qh @ kh / math.sqrt(self.dk)
        if bias is not None:
            att = att + bias
        if mask is not None:
            att = att.masked_fill(mask == 0, float("-inf"))
        att = att.softmax(-1)
        out = (att @ vh).permute(0, 2, 1, 3).reshape(B, Nq, d)
        return self.ln(q + self.o(out))


class FatGCN(nn.Module):
    def __init__(self):
        super().__init__()
        self.nn_edge = nn.Sequential(nn.Linear(3 * D, 2 * D), nn.ReLU(), nn.Linear(2 * D, D))
        self.proj_q = nn.Linear(D, D)
        self.proj_e = nn.Linear(D, D)
        self.proj_v = nn.Linear(D, D_ATT)
        dh = D // HEADS + D // HEADS
        self.gate = nn.Sequential(nn.Linear(dh, dh), nn.ReLU(), nn.Linear(dh, D_ATT // HEADS))
        self.prop = nn.Sequential(nn.Linear(D + D_ATT, D + D_ATT), nn.ReLU(), nn.Linear(D + D_ATT, D))

    def forward(self, x, e, ei):
        xi, xj = x[ei[:, 0]], x[ei[:, 1]]
        e_new = self.nn_edge(torch.cat([xi, e, xj], -1))
        val = self.proj_v(xj)
        q = self.proj_q(xi).view(-1, D // HEADS, HEADS)
        ep = self.proj_e(e).view(-1, D // HEADS, HEADS)
        g = self.gate(torch.cat([q, ep], 1).transpose(1, 2)).transpose(1, 2)
        g = g.softmax(1).reshape(-1, D_ATT)
        msg = g * val
        agg = torch.zeros(x.shape[0], D_ATT).scatter_reduce(
            0, ei[:, 0:1].expand(-1, D_ATT), msg, reduce="amax", include_self=False
        )
        agg = torch.nan_to_num(agg, neginf=0.0)
        return self.prop(torch.cat([x, agg], -1)), e_new


class TorchMMGNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.obj_enc = PointNet(3, 768)
        self.rel_enc_2d = PointNet(11, D)
        self.rel_enc_3d = PointNet(11, D)
        self.mlp3d = nn.Sequential(nn.Linear(768, D - 8), nn.BatchNorm1d(D - 8), nn.ReLU())
        self.adapter = nn.Sequential(nn.Linear(D, 256), nn.ReLU(), nn.Linear(256, D))
        self.dist_mlp = nn.Sequential(
            nn.Linear(4, 32), nn.ReLU(), nn.LayerNorm(32),
            nn.Linear(32, 32), nn.ReLU(), nn.LayerNorm(32), nn.Linear(32, HEADS))
        self.self_attn = nn.ModuleList(MHA(D, HEADS) for _ in range(DEPTH))
        self.cross_attn = nn.ModuleList(MHA(D, HEADS) for _ in range(DEPTH))
        self.cross_attn_rel = nn.ModuleList(MHA(D, HEADS) for _ in range(DEPTH))
        self.gcn3 = nn.ModuleList(FatGCN() for _ in range(DEPTH))
        self.gcn2 = nn.ModuleList(FatGCN() for _ in range(DEPTH))
        self.rel_head_3d = nn.Sequential(nn.Linear(D, 512), nn.ReLU(), nn.Linear(512, 256), nn.ReLU(), nn.Linear(256, C_REL), nn.Sigmoid())
        self.rel_head_2d = nn.Sequential(nn.Linear(D, 512), nn.ReLU(), nn.Linear(512, 256), nn.ReLU(), nn.Linear(256, C_REL), nn.Sigmoid())
        self.obj_pred_3d = nn.Linear(D, C_OBJ)
        self.obj_pred_2d = nn.Linear(D, C_OBJ)
        self.scale = nn.Parameter(torch.tensor(np.log(1 / 0.07), dtype=torch.float32))

    @torch.no_grad()
    def forward(self, pts, feats2d, desc, ei, batch_ids):
        f = self.obj_enc(pts)
        f = self.mlp3d(f)
        sp = desc[:, 3:].clone()
        sp[:, 6:] = sp[:, 6:].log()
        f3d = torch.cat([f, sp], -1)

        di, dj = desc[ei[:, 0]], desc[ei[:, 1]]
        ed = torch.cat([di[:, :6] - dj[:, :6], (di[:, 6:] / dj[:, 6:]).log()], -1)
        e2 = self.rel_enc_2d(ed.unsqueeze(1))
        e3 = self.rel_enc_3d(ed.unsqueeze(1))
        f2d = self.adapter(feats2d)

        # reference-style per-scene mask / distance-bias loop
        n = f3d.shape[0]
        mask = torch.zeros(1, 1, n, n)
        bias = torch.zeros(1, HEADS, n, n)
        count = 0
        centers = desc[:, :3]
        for b in range(int(batch_ids.max().item()) + 1):
            idx = torch.where(batch_ids == b)[0]
            k = len(idx)
            mask[:, :, count:count + k, count:count + k] = 1
            ca = centers[idx].unsqueeze(0).expand(k, -1, -1)
            cb = centers[idx].unsqueeze(1).expand(-1, k, -1)
            delta = ca - cb
            dist = delta.pow(2).sum(-1, keepdim=True).sqrt()
            w = self.dist_mlp(torch.cat([delta, dist], -1).unsqueeze(0))
            bias[:, :, count:count + k, count:count + k] = w.permute(0, 3, 1, 2)
            count += k

        f3d, f2d = f3d.unsqueeze(0), f2d.unsqueeze(0)
        e3, e2 = e3, e2
        for i in range(DEPTH):
            f3d = self.self_attn[i](f3d, f3d, f3d, bias, mask)
            f2d = self.cross_attn[i](f2d, f3d, f3d, bias, mask)
            a3, e3 = self.gcn3[i](f3d[0], e3, ei)
            a2, e2 = self.gcn2[i](f2d[0], e2, ei)
            e2 = self.cross_attn_rel[i](e2.unsqueeze(0), e3.unsqueeze(0), e3.unsqueeze(0))[0]
            f3d, f2d = a3.unsqueeze(0), a2.unsqueeze(0)
            if i < DEPTH - 1:
                f3d, f2d = F.relu(f3d), F.relu(f2d)
                e3, e2 = F.relu(e3), F.relu(e2)

        r3 = self.rel_head_3d(e3)
        r2 = self.rel_head_2d(e2)
        s = self.scale.exp()
        o3 = s * self.obj_pred_3d(F.normalize(f3d[0], dim=-1))
        o2 = s * self.obj_pred_2d(F.normalize(f2d[0], dim=-1))
        return o3, o2, r3, r2


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.RandomState(0)
    node_counts = (9, 11, 12, 13, 14, 15, 16, 10) * 4  # same as bench.py

    # build one concatenated batch, reference collate style
    pts_l, desc_l, ei_l, bid_l = [], [], [], []
    count = 0
    for b, n in enumerate(node_counts):
        c = rng.randn(n, 1, 3).astype(np.float32) * 2
        s = 0.2 + rng.rand(n, 1, 3).astype(np.float32)
        p = c + rng.randn(n, 128, 3).astype(np.float32) * s
        cen = p.mean(1)
        std = p.std(1, ddof=1)
        dims = p.max(1) - p.min(1)
        desc = np.concatenate([cen, std, dims, dims.prod(-1, keepdims=True), dims.max(-1, keepdims=True)], -1)
        pts_l.append(p - p.mean(1, keepdims=True))
        desc_l.append(desc)
        idx = np.arange(n)
        src, dst = np.repeat(idx, n), np.tile(idx, n)
        keep = src != dst
        ei_l.append(np.stack([src[keep], dst[keep]], -1) + count)
        bid_l.append(np.full(n, b))
        count += n
    pts = torch.from_numpy(np.concatenate(pts_l)).float()
    desc = torch.from_numpy(np.concatenate(desc_l)).float()
    ei = torch.from_numpy(np.concatenate(ei_l)).long()
    bids = torch.from_numpy(np.concatenate(bid_l)).long()
    f2d = torch.randn(pts.shape[0], D)

    model = TorchMMGNet().eval()
    with torch.no_grad():
        model(pts, f2d, desc, ei, bids)  # warmup
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            model(pts, f2d, desc, ei, bids)
        dt = time.perf_counter() - t0
    sps = len(node_counts) * iters / dt
    out = {"torch_cpu_scenes_per_sec": round(sps, 2), "threads": torch.get_num_threads()}
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_baseline.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
