"""Rate-distortion and example plots.

Reference: Evaluation/dac_vcpwq_proposed6_latency.py:880-1030 (helpers + example
waveform/mel plots) and :1160-1342 (five rate-distortion figures). Conventions kept:
errorbar curves with +-CI fill bands, proposed runs grouped by embed size K with
fixed markers {128: o, 256: ^, 512: D}, ST-SIM y-range [0.80, 1.00].
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

EMBED_MARKERS = {128: "o", 256: "^", 512: "D"}
Y_STSIM = (0.80, 1.00)


def _group_by_embed(rows: Sequence[dict]) -> dict:
    groups: dict = {}
    for r in rows:
        groups.setdefault(int(r["embed"]), []).append(r)
    for k in groups:
        groups[k] = sorted(groups[k], key=lambda x: x["kbps"])
    return groups


def _errfill(x, y, ci, label, marker, color=None):
    x, y, ci = np.asarray(x), np.asarray(y), np.asarray(ci)
    line, = plt.plot(x, y, marker + "-", lw=2.0, ms=0, label=label, color=color)
    plt.scatter(x, y, s=36, zorder=3, color=line.get_color())
    plt.fill_between(x, y - ci, y + ci, alpha=0.20, color=line.get_color())


def _one_rd_plot(dac24: dict, proposed: Sequence[dict], vc: Sequence[dict],
                 metric: str, ylabel: str, out_path: str,
                 ylim=None) -> None:
    plt.figure(figsize=(9, 6))
    if dac24:
        qs = sorted(dac24, key=lambda q: dac24[q]["kbps"])
        _errfill([dac24[q]["kbps"] for q in qs],
                 [dac24[q][f"{metric}_mean"] for q in qs],
                 [dac24[q][f"{metric}_ci95"] for q in qs],
                 "DAC-class backbone", "s")
    for embed, rows in _group_by_embed(proposed).items():
        _errfill([r["kbps"] for r in rows],
                 [r[f"{metric}_mean"] for r in rows],
                 [r[f"{metric}_ci95"] for r in rows],
                 f"Proposed K={embed}", EMBED_MARKERS.get(embed, "x"))
    if vc:
        rows = sorted(vc, key=lambda r: r["kbps"])
        _errfill([r["kbps"] for r in rows],
                 [r[f"{metric}_mean"] for r in rows],
                 [r[f"{metric}_ci95"] for r in rows],
                 "VC-PWQ", "v")
    plt.xlabel("Bitrate (kbps)")
    plt.ylabel(ylabel)
    if ylim:
        plt.ylim(*ylim)
    plt.grid(True, alpha=0.4)
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()


def rate_distortion_plots(dac24: dict, proposed: Sequence[dict],
                          vc: Sequence[dict], out_dir: str) -> list[str]:
    """The reference's RD figure set (ST-SIM/PSNR vs kbps, + CR variants)."""
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for metric, ylabel, fname, ylim in [
        ("stsim", "ST-SIM", "stsim_vs_kbps.png", Y_STSIM),
        ("psnr", "PSNR (dB, global peak)", "psnr_vs_kbps.png", None),
    ]:
        p = os.path.join(out_dir, fname)
        _one_rd_plot(dac24, proposed, vc, metric, ylabel, p, ylim)
        outs.append(p)

    # compression-ratio variants — all three systems, like the kbps figures
    # (reference plots 3/4 include the DAC 24k and VC-PWQ errorbar curves,
    # Evaluation/dac_vcpwq_proposed6_latency.py:1264-1309)
    def cr_axis(rows):
        return [r["compression_ratio"] for r in rows]

    dac_rows = sorted((dac24 or {}).values(),
                      key=lambda r: r.get("compression_ratio") or 0)
    dac_rows = [r for r in dac_rows if r.get("compression_ratio")]
    vc_rows = sorted([r for r in (vc or []) if r.get("compression_ratio")],
                     key=lambda r: r["compression_ratio"])
    for metric, ylabel, fname in [("stsim", "ST-SIM", "stsim_vs_cr.png"),
                                  ("psnr", "PSNR (dB)", "psnr_vs_cr.png")]:
        plt.figure(figsize=(9, 6))
        if dac_rows:
            _errfill(cr_axis(dac_rows),
                     [r[f"{metric}_mean"] for r in dac_rows],
                     [r[f"{metric}_ci95"] for r in dac_rows],
                     "DAC-class backbone", "s")
        for embed, rows in _group_by_embed(proposed).items():
            rows = sorted(rows, key=lambda r: r["compression_ratio"] or 0)
            _errfill(cr_axis(rows), [r[f"{metric}_mean"] for r in rows],
                     [r[f"{metric}_ci95"] for r in rows],
                     f"Proposed K={embed}", EMBED_MARKERS.get(embed, "x"))
        if vc_rows:
            _errfill(cr_axis(vc_rows),
                     [r[f"{metric}_mean"] for r in vc_rows],
                     [r[f"{metric}_ci95"] for r in vc_rows],
                     "VC-PWQ", "v")
        plt.xlabel("Compression ratio (x)")
        plt.ylabel(ylabel)
        plt.grid(True, alpha=0.4)
        plt.legend()
        plt.tight_layout()
        p = os.path.join(out_dir, fname)
        plt.savefig(p, dpi=150)
        plt.close()
        outs.append(p)

    # figure 5: compression ratio vs bitrate, all three systems (reference
    # Evaluation/dac_vcpwq_proposed6_latency.py:1314-1341 — plain lines,
    # no error bars: CR is deterministic given the rate)
    plt.figure(figsize=(9, 6))
    for embed, rows in _group_by_embed(proposed).items():
        rows = [r for r in rows if r.get("compression_ratio")]
        plt.plot([r["kbps"] for r in rows], cr_axis(rows),
                 EMBED_MARKERS.get(embed, "x") + "-", lw=2.0, ms=6,
                 label=f"Proposed K={embed}")
    if dac_rows:
        d = sorted(dac_rows, key=lambda r: r["kbps"])
        plt.plot([r["kbps"] for r in d], cr_axis(d), "s-", lw=2.0, ms=6,
                 label="DAC-class backbone")
    if vc_rows:
        v = sorted(vc_rows, key=lambda r: r["kbps"])
        plt.plot([r["kbps"] for r in v], cr_axis(v), "v-", lw=2.0, ms=6,
                 label="VC-PWQ")
    plt.xlabel("Bitrate (kbps)")
    plt.ylabel("Compression ratio (x)")
    plt.grid(True, alpha=0.4)
    plt.legend()
    plt.tight_layout()
    p = os.path.join(out_dir, "cr_vs_bitrate.png")
    plt.savefig(p, dpi=150)
    plt.close()
    outs.append(p)
    return outs


def plot_examples(best_run: dict, cfg, backbones: dict, pairs, out_dir: str,
                  num_examples: int = 10) -> None:
    """Waveform overlays + side-by-side log-mel spectrograms for the best run
    (reference: plot_proposed_examples, :898-1030)."""
    import jax
    import jax.numpy as jnp

    from ..dsp.mel import mel_mag
    from ..dsp.resample import resample
    from ..models import allpred_ar
    from ..train import checkpoint as ckpt
    from ..utils.wav_io import load_wav_mono
    from .metrics import align_and_psnr_raw

    run_cfg = cfg.with_rvq(int(best_run["books"]), int(best_run["embed"]))
    template = allpred_ar.head_init(jax.random.key(0), run_cfg)
    head, _, _ = ckpt.load_checkpoint_tolerant(
        os.path.join(best_run["path"], "best.msgpack"), template)
    params = allpred_ar.CodecParams(backbones["audio"], backbones["tactile"], head)
    sr24 = run_cfg.dac.sample_rate

    for idx, (a_path, t_path, stem) in enumerate(pairs[:num_examples]):
        a_raw, sr_a = load_wav_mono(a_path)
        t_raw, sr_t = load_wav_mono(t_path)
        scale = max(float(np.abs(t_raw).max()), 1e-8)
        a24 = np.asarray(resample(np.asarray(a_raw / scale), sr_a, sr24))
        t24 = np.asarray(resample(np.asarray(t_raw / scale), sr_t, sr24))
        L = min(a24.shape[-1], t24.shape[-1])
        y24 = np.asarray(allpred_ar.forward_eval(
            params, run_cfg, jnp.asarray(a24[None, :, :L]),
            jnp.asarray(t24[None, :, :L]),
            n_books_use=int(best_run["books"])))[0]
        est = np.asarray(resample(np.asarray(y24 * scale), sr24, sr_t))
        _, r_a, e_a = align_and_psnr_raw(t_raw, est, 1.0)

        T = r_a.shape[-1]
        t_axis = np.arange(T) / float(sr_t)
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(t_axis, r_a[0], label="Original", linewidth=1.0)
        ax.plot(t_axis, e_a[0], label="Reconstructed", linewidth=1.0, alpha=0.8)
        ax.set_xlabel("Time (s)")
        ax.set_ylabel("Amplitude")
        ax.set_title(stem)
        ax.grid(True, alpha=0.3)
        ax.legend(loc="upper right", fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"proposed_example_{idx+1:02d}.png"),
                    dpi=180)
        plt.close(fig)

        r24 = np.asarray(resample(np.asarray(r_a), sr_t, sr24))
        e24 = np.asarray(resample(np.asarray(e_a), sr_t, sr24))
        Mr = 20 * np.log10(np.asarray(mel_mag(np.asarray(r24)))[0] + 1e-8)
        Me = 20 * np.log10(np.asarray(mel_mag(np.asarray(e24)))[0] + 1e-8)
        t_mel = np.arange(Mr.shape[-1]) * 128 / float(sr24)
        fig, axes = plt.subplots(1, 2, figsize=(10, 3), sharey=True)
        for ax_i, (M, title) in zip(axes, [(Mr, "Original"),
                                           (Me, "Reconstructed")]):
            im = ax_i.imshow(M, aspect="auto", origin="lower",
                             extent=[t_mel[0], t_mel[-1], 0, M.shape[0]])
            ax_i.set_title(title)
            ax_i.set_xlabel("Time (s)")
        axes[0].set_ylabel("Mel bin")
        fig.suptitle(f"Log-mel Spectrogram - {stem}", y=0.98)
        fig.tight_layout(rect=[0, 0, 0.93, 0.92])
        cax = fig.add_axes([0.94, 0.15, 0.015, 0.65])
        fig.colorbar(im, cax=cax).set_label("Log-mel (dB)")
        fig.savefig(os.path.join(out_dir, f"proposed_example_{idx+1:02d}_mel.png"),
                    dpi=180)
        plt.close(fig)
