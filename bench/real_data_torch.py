"""Torch control for the GFM-objective direct-force finding (r4 VERDICT
item 5).

real_data_r4.md section 1 found that reference-semantics (sum-aggregated)
EGNN learns ~zero direct-force signal on the EAM-alloy campaign, and argued
this is a property of the architecture the reference ships, not of this
implementation. This script turns the argument into a measurement: a plain
TORCH transcription of the reference EGCL semantics (edge MLP on
[x_src, x_dst, d]; messages index_add'ed into SOURCE nodes — the exact
layer the parity suite verifies against models/EGCLStack.py:175-298,292-298)
trained on the SAME EAM-alloy dataset (same generator seed), same GFM260
objective shape (graph energy head + DIRECT node-force head, task weights
[1, 30]), same optimizer family.

Run:  python bench/real_data_torch.py --epochs 30 --configs 300 [--aggr mean]
Pair with the jax side at the same scale:
      python -c "import sys; sys.path.insert(0,'bench'); from real_data \
      import run_gfm_objective; import json; \
      print(json.dumps(run_gfm_objective(30, 300, 'EGNN', 'sum')))"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_torch_dataset(n_configs, seed=11):
    """Identical data to real_data.make_eam_alloy_dataset (same seed)."""
    from real_data import make_eam_alloy_dataset

    return make_eam_alloy_dataset(n_configs, seed=seed)


def make_model(in_dim, hidden, layers, aggr):
    import torch

    class EGCL(torch.nn.Module):
        def __init__(self, fin, fout, h):
            super().__init__()
            self.e0 = torch.nn.Linear(2 * fin + 1, h)
            self.e1 = torch.nn.Linear(h, h)
            self.n0 = torch.nn.Linear(fin + h, h)
            self.n1 = torch.nn.Linear(h, fout)

        def forward(self, x, d, send, recv, n_nodes):
            import torch

            m_in = torch.cat([x[send], x[recv], d[:, None]], dim=1)
            m = torch.relu(self.e1(torch.relu(self.e0(m_in))))
            agg = torch.zeros(n_nodes, m.shape[1], dtype=m.dtype)
            # reference semantics: SUM into SOURCE nodes
            # (EGCLStack.py:292-298); --aggr mean divides by out-degree
            agg.index_add_(0, send, m)
            if aggr == "mean":
                deg = torch.zeros(n_nodes, dtype=m.dtype)
                deg.index_add_(0, send, torch.ones_like(d))
                agg = agg / deg.clamp(min=1.0)[:, None]
            return self.n1(torch.relu(self.n0(torch.cat([x, agg], dim=1))))

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            dims = [in_dim] + [hidden] * layers
            self.convs = torch.nn.ModuleList(
                [EGCL(dims[i], dims[i + 1], hidden) for i in range(layers)]
            )
            # GFM260 head shape: graph = shared 2x50 then 2x[hidden] -> 1
            # on mean-pooled nodes; node = mlp 2x[hidden] -> 3
            self.g_shared = torch.nn.Sequential(
                torch.nn.Linear(hidden, 50), torch.nn.ReLU(),
                torch.nn.Linear(50, 50), torch.nn.ReLU(),
            )
            self.g_head = torch.nn.Sequential(
                torch.nn.Linear(50, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, 1),
            )
            self.n_head = torch.nn.Sequential(
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, 3),
            )

        def forward(self, x, d, send, recv, graph_idx, n_graphs):
            import torch

            h = x
            for conv in self.convs:
                h = conv(h, d, send, recv, x.shape[0])
            pooled = torch.zeros(n_graphs, h.shape[1], dtype=h.dtype)
            pooled.index_add_(0, graph_idx, h)
            cnt = torch.zeros(n_graphs, dtype=h.dtype)
            cnt.index_add_(0, graph_idx, torch.ones(h.shape[0]))
            pooled = pooled / cnt[:, None]
            energy = self.g_head(self.g_shared(pooled))[:, 0]
            forces = self.n_head(h)
            return energy, forces

    return Net()


def run_torch_control(epochs, configs, aggr="sum", hidden=128, layers=4,
                      radius=4.2, max_neigh=24, seed=0):
    import torch

    torch.manual_seed(seed)
    data = build_torch_dataset(configs)
    n = len(data)
    n_train = int(0.8 * n)
    n_val = (n - n_train) // 2
    train, test = data[:n_train], data[n_train + n_val:]

    # per-config tensors from the dataset's own edges (identical graph to
    # the jax run: edge_shifts are already cartesian)
    def prep(samples):
        out = []
        for s in samples:
            send, recv = np.asarray(s.edge_index, np.int64)
            rel = s.pos[recv] - s.pos[send] + np.asarray(s.edge_shifts)
            d = np.sqrt((rel ** 2).sum(-1) + 1e-24).astype(np.float32)
            out.append((
                torch.from_numpy(np.asarray(s.x, np.float32)),
                torch.from_numpy(d),
                torch.from_numpy(send),
                torch.from_numpy(recv),
                torch.tensor(float(np.asarray(s.y_graph)[0])),
                torch.from_numpy(np.asarray(s.y_node, np.float32)),
            ))
        return out

    tr = prep(train)
    te = prep(test)
    in_dim = tr[0][0].shape[1]
    model = make_model(in_dim, hidden, layers, aggr)
    opt = torch.optim.AdamW(model.parameters(), lr=2e-3)

    # normalize targets like the jax pipeline (update_config minmax is
    # dataset-level; plain standardization serves the same purpose here)
    es = torch.stack([t[4] for t in tr])
    e_mu, e_sd = es.mean(), es.std().clamp(min=1e-6)
    fs = torch.cat([t[5] for t in tr])
    f_sd = fs.abs().mean().clamp(min=1e-6)

    rng = np.random.RandomState(1)
    bs = 16
    for ep in range(epochs):
        order = rng.permutation(len(tr))
        tot = 0.0
        for i0 in range(0, len(order) - bs + 1, bs):
            batch = [tr[j] for j in order[i0:i0 + bs]]
            # disjoint-union batch
            xs, ds, sends, recvs, gi = [], [], [], [], []
            off = 0
            for g, (x, d, sd, rv, e, f) in enumerate(batch):
                xs.append(x); ds.append(d)
                sends.append(sd + off); recvs.append(rv + off)
                gi.append(torch.full((x.shape[0],), g, dtype=torch.int64))
                off += x.shape[0]
            X = torch.cat(xs); D = torch.cat(ds)
            S = torch.cat(sends); R = torch.cat(recvs)
            GI = torch.cat(gi)
            E = torch.stack([b[4] for b in batch])
            F = torch.cat([b[5] for b in batch])
            pe, pf = model(X, D, S, R, GI, len(batch))
            loss = torch.mean((pe - (E - e_mu) / e_sd) ** 2)
            loss = loss + 30.0 * torch.mean((pf - F / f_sd) ** 2)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss)
        if ep % max(1, epochs // 10) == 0:
            print(f"# epoch {ep}: train loss {tot:.4f}", file=sys.stderr)

    # test metrics, denormalized — same protocol as
    # real_data.eval_direct_heads
    with torch.no_grad():
        e_err, e_abs, f_err, f_abs = [], [], [], []
        for (x, d, sd, rv, e, f) in te:
            gi = torch.zeros(x.shape[0], dtype=torch.int64)
            pe, pf = model(x, d, sd, rv, gi, 1)
            e_err.append(float(torch.abs(pe[0] * e_sd + e_mu - e)))
            e_abs.append(float(torch.abs(e)))
            f_err.append(float(torch.abs(pf * f_sd - f).mean()))
            f_abs.append(float(torch.abs(f).mean()))
    em, eb = float(np.mean(e_err)), float(np.mean(e_abs))
    fm, fb = float(np.mean(f_err)), float(np.mean(f_abs))
    return {
        "run": f"EAMalloy_GFMobjective_TORCH_EGNN_{aggr}",
        "configs": configs,
        "epochs": epochs,
        "energy_mae": round(em, 6),
        "energy_mean_abs": round(eb, 6),
        "force_mae": round(fm, 6),
        "force_mean_abs": round(fb, 6),
        "energy_rel_mae": round(em / max(eb, 1e-12), 4),
        "force_rel_mae": round(fm / max(fb, 1e-12), 4),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--configs", type=int, default=300)
    p.add_argument("--aggr", default="sum", choices=["sum", "mean"])
    args = p.parse_args()
    print(json.dumps(run_torch_control(args.epochs, args.configs,
                                       args.aggr)), flush=True)
