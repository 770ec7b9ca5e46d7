"""train_para: native SAN-M encoder + frozen-frontend SV training
(reference: speakerlab/bin/train_para.py — there the encoder is an external
funasr asset; here it is models/sanm.py)."""

import os

import numpy as np
import yaml

FS = 16000


def test_lfr_device_matches_host():
    from speaker3d_tpu.data.processor_para import apply_lfr, apply_lfr_device

    rng = np.random.default_rng(0)
    for t, m, n in [(298, 7, 6), (97, 7, 6), (10, 5, 1), (13, 3, 3)]:
        x = rng.standard_normal((t, 8)).astype(np.float32)
        want = apply_lfr(x, m, n)
        got = np.asarray(apply_lfr_device(x[None], m, n))[0]
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-6)


def test_sanm_encoder_shapes_and_jit():
    import jax

    from speaker3d_tpu.models.sanm import SANMEncoder

    enc = SANMEncoder(input_dim=40, d_model=32, num_heads=2, ffn_dim=64,
                      num_layers=2, kernel_size=5)
    x = np.random.default_rng(1).standard_normal((2, 17, 40)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: enc.apply(v, x))(variables, x)
    assert out.shape == (2, 17, 32)
    # memory branch is local: distant-frame perturbation beyond the FIR
    # kernel still flows through attention, so outputs must differ.
    # (perturb ONE feature dim: a constant offset across the whole frame
    # would be annulled by funasr's pre-LN on the raw input)
    x2 = x.copy()
    x2[:, 0, 3] += 1.0
    out2 = enc.apply(variables, x2)
    assert not np.allclose(out[:, 16], out2[:, 16], atol=1e-6)


def test_train_para_e2e(tmp_path):
    """Tiny end-to-end run: frozen SAN-M features -> Xvector -> AAM learns."""
    from speaker3d_tpu.utils.fileio import write_wav

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    for s in range(2):
        for u in range(4):
            wav = (0.3 * np.sin(2 * np.pi * (250 + 900 * s)
                                * np.arange(FS) / FS)
                   + 0.01 * rng.standard_normal(FS)).astype(np.float32)
            p = os.path.join(root, "wav", f"s{s}u{u}.wav")
            write_wav(p, wav, FS)
            rows.append((f"s{s}u{u}", p, f"spk{s}"))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("ID,wav,spk\n")
        for r in rows:
            f.write(",".join(r) + "\n")

    config = {
        "exp_dir": os.path.join(root, "exp"),
        "data": os.path.join(root, "train.csv"),
        # wav_len must give enough LFR frames for the Xvector receptive
        # field (15): 1.0 s -> 98 fbank frames -> 17 LFR frames
        "wav_len": 1.0, "speed_pertub": False, "aug_prob": 0.0,
        "batch_size": 4, "num_workers": 2, "num_epoch": 12,
        "embedding_size": 16, "max_lr": 0.05, "min_lr": 0.005,
        "warmup_epoch": 1, "log_batch_freq": 1,
        "lfr_m": 7, "lfr_n": 6, "fbank_dim": 80,
        "asr_encoder": {"args": {"d_model": 32, "num_heads": 2,
                                 "ffn_dim": 64, "num_layers": 2,
                                 "kernel_size": 5}},
        "model": {"obj": "speaker3d_tpu.models.xvector.Xvector",
                  "args": {"hid_dim": 16, "stats_dim": 32, "embed_dim": 16}},
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from speaker3d_tpu.cli.train_para import main as train_main

    train_main(["--config", cfg_path])
    exp_dir = config["exp_dir"]
    log = open(os.path.join(exp_dir, "train_epoch.log")).read().strip()
    lines = log.splitlines()

    def field(line, key):
        return float(line.split(f"{key}:")[1].split(" - ")[0].strip())

    first_loss = field(lines[0], "avg_loss")
    last_loss = field(lines[-1], "avg_loss")
    last_acc = field(lines[-1], "avg_acc")
    assert np.isfinite(last_loss), log
    # AAM loss collapses by >5x on the 2-speaker toy corpus; the train-acc
    # approximation (target-vs-global-max cosine) is noisy at this scale so
    # only require better-than-chance
    assert last_loss < first_loss / 5, log
    assert last_acc >= 0.5, log
    assert os.path.isdir(os.path.join(exp_dir, "models", "CKPT-EPOCH-12-00"))


def _torch_funasr_sanm(input_dim, d_model, num_heads, ffn_dim, num_layers,
                       kernel_size):
    """Torch mirror of funasr's SANMEncoder (funasr/models/sanm/
    {encoder,attention}.py) with funasr parameter naming — the in-repo
    oracle for the checkpoint converter (no funasr/network here)."""
    import torch
    import torch.nn as nn

    class Attn(nn.Module):
        def __init__(self, in_feat, n_feat, h, k):
            super().__init__()
            self.h, self.d_k = h, n_feat // h
            self.linear_q_k_v = nn.Linear(in_feat, n_feat * 3)
            self.fsmn_block = nn.Conv1d(n_feat, n_feat, k, stride=1,
                                        padding=0, groups=n_feat, bias=False)
            left = (k - 1) // 2
            self.pad = nn.ConstantPad1d((left, k - 1 - left), 0.0)
            self.linear_out = nn.Linear(n_feat, n_feat)

        def forward(self, x):
            b, t, _ = x.shape
            q, k, v = torch.chunk(self.linear_q_k_v(x), 3, dim=-1)
            mem = self.fsmn_block(self.pad(v.transpose(1, 2))) \
                .transpose(1, 2) + v
            sh = (b, t, self.h, self.d_k)
            q_h = q.reshape(*sh).transpose(1, 2) * self.d_k ** -0.5
            k_h = k.reshape(*sh).transpose(1, 2)
            v_h = v.reshape(*sh).transpose(1, 2)
            att = torch.softmax(q_h @ k_h.transpose(-2, -1), dim=-1)
            ctx = (att @ v_h).transpose(1, 2).reshape(b, t, -1)
            return self.linear_out(ctx) + mem

    class FFN(nn.Module):
        def __init__(self, d, ffn):
            super().__init__()
            self.w_1 = nn.Linear(d, ffn)
            self.w_2 = nn.Linear(ffn, d)

        def forward(self, x):
            return self.w_2(torch.relu(self.w_1(x)))

    class Layer(nn.Module):
        def __init__(self, in_size, d, h, ffn, k):
            super().__init__()
            self.in_size, self.size = in_size, d
            self.self_attn = Attn(in_size, d, h, k)
            self.feed_forward = FFN(d, ffn)
            self.norm1 = nn.LayerNorm(in_size)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, x):
            att = self.self_attn(self.norm1(x))
            x = x + att if self.in_size == self.size else att
            return x + self.feed_forward(self.norm2(x))

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoders0 = nn.ModuleList(
                [Layer(input_dim, d_model, num_heads, ffn_dim, kernel_size)])
            self.encoders = nn.ModuleList(
                [Layer(d_model, d_model, num_heads, ffn_dim, kernel_size)
                 for _ in range(num_layers - 1)])
            self.after_norm = nn.LayerNorm(d_model)

        def forward(self, x):
            t, depth = x.shape[1], x.shape[2]
            pos = torch.arange(1, t + 1, dtype=torch.float64)[:, None]
            inc = torch.log(torch.tensor(10000.0, dtype=torch.float64)) \
                / (depth / 2 - 1)
            inv = torch.exp(torch.arange(depth // 2, dtype=torch.float64)
                            * -inc)[None, :]
            pe = torch.cat([torch.sin(pos * inv), torch.cos(pos * inv)],
                           dim=1).to(x.dtype)
            h = x * d_model ** 0.5 + pe[None]
            h = self.encoders0[0](h)
            for layer in self.encoders:
                h = layer(h)
            return self.after_norm(h)

    return Enc()


def test_sanm_funasr_checkpoint_parity():
    """Weight-for-weight: a funasr-named torch SANM encoder state_dict
    converted via compat.funasr_convert matches the flax forward."""
    import jax
    import torch

    from speaker3d_tpu.compat.funasr_convert import load_funasr_encoder
    from speaker3d_tpu.models.sanm import SANMEncoder

    dims = dict(input_dim=20, d_model=16, num_heads=2, ffn_dim=32,
                num_layers=3, kernel_size=5)
    torch.manual_seed(0)
    oracle = _torch_funasr_sanm(**dims).eval()
    x = np.random.default_rng(2).standard_normal((2, 23, 20)) \
        .astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()

    enc = SANMEncoder(**dims)
    # simulate the full-model checkpoint layout: encoder.* prefix + extras
    sd = {f"encoder.{k}": v for k, v in oracle.state_dict().items()}
    sd["decoder.something.weight"] = torch.zeros(1)
    params = load_funasr_encoder(sd, enc, x[:1])
    with jax.default_matmul_precision("highest"):
        got = np.asarray(enc.apply({"params": params}, x))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_sanm_odd_d_model():
    """Odd d_model must not crash the sinusoidal PE (regression)."""
    import jax

    from speaker3d_tpu.models.sanm import SANMEncoder

    enc = SANMEncoder(input_dim=10, d_model=33, num_heads=3, ffn_dim=16,
                      num_layers=1, kernel_size=3)
    x = np.zeros((1, 7, 10), np.float32)
    out = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 7, 33)
