"""Generate the golden-checkpoint fixture (run once, requires /root/reference).

Trains the REFERENCE PointNetCls (3-class, 500 points — the
``pointnetgpd_3class.model`` configuration, reference
PointNetGPD/main_test.py:34-41) for a few Adam steps on synthetic data so the
weights and BN running stats are "trained", then freezes:

- ``golden_pointnet_3class.npz``  — the torch state_dict as numpy arrays
  (keys preserved; loads into either models/convert.convert_state_dict or
  the reference classes via load_state_dict)
- ``golden_io.npz``               — a fixed eval input batch (torch layout
  (B, C, N)) with the reference model's eval-mode outputs (log_softmax
  logits + STN trans), computed in torch fp32

so converter parity and the exact-inference tests run with the reference
tree unmounted (VERDICT round 1, missing item 4).

Usage:  python tests/fixtures/make_golden.py
"""

import importlib.util
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF_POINTNET = "/root/reference/PointNetGPD/model/pointnet.py"


def main():
    import torch

    torch.manual_seed(0)
    spec = importlib.util.spec_from_file_location("_ref_pointnet", REF_POINTNET)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    model = ref.PointNetCls(num_points=500, input_chann=3, k=3)
    opt = torch.optim.Adam(model.parameters(), lr=5e-3)

    # a few steps on synthetic separable data: BN stats move off init,
    # weights move off their symmetric init
    rng = np.random.RandomState(0)
    model.train()
    for step in range(8):
        x = rng.randn(16, 3, 500).astype(np.float32) * 0.02
        y = rng.randint(0, 3, size=16)
        x[np.arange(16), 0] += 0.01 * y[:, None]  # class-dependent shift
        out, _ = model(torch.from_numpy(x))
        loss = torch.nn.functional.nll_loss(out, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(os.path.join(HERE, "golden_pointnet_3class.npz"), **sd)

    model.eval()
    x_eval = rng.randn(4, 3, 500).astype(np.float32) * 0.02
    with torch.no_grad():
        logp, trans = model(torch.from_numpy(x_eval))
    np.savez_compressed(
        os.path.join(HERE, "golden_io.npz"),
        x=x_eval, logp=logp.numpy(), trans=trans.numpy())
    print("wrote golden_pointnet_3class.npz (%.1f MB) + golden_io.npz"
          % (os.path.getsize(os.path.join(
              HERE, "golden_pointnet_3class.npz")) / 1e6))


if __name__ == "__main__":
    main()
