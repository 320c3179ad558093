"""Self-measured reference-style baselines (BASELINE.md step one).

The reference publishes no numbers, so this measures torch-CPU training
throughput for models with the reference's architecture *specs* (built
independently from SURVEY.md §2 C11/C18 — parameter shapes and layer counts,
not the reference's code) and the serial per-clip feature-extraction
baseline.  Results go into BASELINE.md for the TPU comparison.

Run: python benchmarks/reference_torch_bench.py [--steps N]
Prints one JSON object with all measured baselines.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def simple_vae_torch():
    """MLP VAE per C11: 370→[128,64,32]→32 latent, BN+ReLU+Dropout."""

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            dims = [370, 128, 64, 32]
            enc = []
            for a, b in zip(dims[:-1], dims[1:]):
                enc += [nn.Linear(a, b), nn.BatchNorm1d(b), nn.ReLU(), nn.Dropout(0.2)]
            self.enc = nn.Sequential(*enc)
            self.mu = nn.Linear(32, 32)
            self.logvar = nn.Linear(32, 32)
            rdims = [32, 32, 64, 128]
            dec = []
            for a, b in zip(rdims[:-1], rdims[1:]):
                dec += [nn.Linear(a, b), nn.BatchNorm1d(b), nn.ReLU(), nn.Dropout(0.2)]
            dec.append(nn.Linear(128, 370))
            self.dec = nn.Sequential(*dec)

        def forward(self, x):
            h = self.enc(x)
            mu, logvar = self.mu(h), self.logvar(h)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            return self.dec(z), mu, logvar

    return VAE()


def hybrid_vae_torch():
    """Conv+MLP hybrid per C18 (6× stride-2 convs, 16384×1024 Linears)."""

    class Hybrid(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [1, 32, 64, 128, 256, 512, 512]
            enc = []
            for a, b in zip(chans[:-1], chans[1:]):
                enc += [nn.Conv2d(a, b, 3, 2, 1), nn.BatchNorm2d(b), nn.LeakyReLU()]
            self.enc = nn.Sequential(*enc, nn.Flatten())
            self.afc = nn.Linear(16384, 1024)
            self.tenc = nn.Sequential(nn.Linear(768, 256), nn.BatchNorm1d(256),
                                      nn.LeakyReLU(), nn.Linear(256, 128),
                                      nn.BatchNorm1d(128), nn.LeakyReLU())
            self.fuse = nn.Linear(1152, 512)
            self.mu = nn.Linear(512, 128)
            self.logvar = nn.Linear(512, 128)
            self.dec_in = nn.Linear(128, 512)
            self.dec_split = nn.Linear(512, 1152)
            self.adec_fc = nn.Linear(1024, 16384)
            rchans = [512, 512, 256, 128, 64, 32]
            dec = []
            for a, b in zip(rchans[:-1], rchans[1:]):
                dec += [nn.ConvTranspose2d(a, b, 3, 2, 1, 1),
                        nn.BatchNorm2d(b), nn.LeakyReLU()]
            dec.append(nn.ConvTranspose2d(32, 1, 3, 2, 1, 1))
            self.adec = nn.Sequential(*dec)
            self.tdec = nn.Sequential(nn.Linear(128, 256), nn.BatchNorm1d(256),
                                      nn.LeakyReLU(), nn.Linear(256, 768))

        def forward(self, audio, text):
            a = self.afc(self.enc(audio))
            t = self.tenc(text)
            h = torch.relu(self.fuse(torch.cat([a, t], 1)))
            mu, logvar = self.mu(h), self.logvar(h)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            s = torch.relu(self.dec_split(torch.relu(self.dec_in(z))))
            ra = self.adec(torch.relu(self.adec_fc(s[:, :1024])).view(-1, 512, 2, 16))
            rt = self.tdec(s[:, 1024:])
            return ra, rt, mu, logvar

    return Hybrid()


def time_steps(model, make_batch, loss_fn, steps: int, lr=1e-4):
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    batch = make_batch()
    # warmup
    loss = loss_fn(model, batch)
    opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.time()
    for _ in range(steps):
        loss = loss_fn(model, batch)
        opt.zero_grad(); loss.backward(); opt.step()
    return steps / (time.time() - t0)


def main():
    torch.manual_seed(42)
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 5
    out = {}

    x = torch.randn(32, 370)
    out["simple_vae_torch_cpu_steps_per_sec"] = round(time_steps(
        simple_vae_torch(), lambda: x,
        lambda m, b: ((m(b)[0] - b) ** 2).mean(), steps=max(steps * 4, 20),
    ), 2)

    audio = torch.randn(32, 1, 128, 1024)
    text = torch.randn(32, 768)
    def hybrid_loss(m, b):
        ra, rt, mu, logvar = m(*b)
        return (((ra - b[0]) ** 2).sum() + 350 * ((rt - b[1]) ** 2).sum()
                - 0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum())
    out["hybrid_vae_torch_cpu_steps_per_sec"] = round(time_steps(
        hybrid_vae_torch(), lambda: (audio, text), hybrid_loss, steps=steps,
    ), 3)

    # serial per-clip extraction baseline (the reference's compute pattern)
    import reference_dsp as ref

    clip = np.random.default_rng(0).standard_normal(661500).astype(np.float32)
    t0 = time.time()
    ref.basic_feature_vector(clip, 22050)
    out["serial_cpu_extraction_clips_per_sec"] = round(1.0 / (time.time() - t0), 3)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
