"""On-chip checks for the TPU-only kernel modes the CPU suite cannot reach
(interpret mode has no prng_seed lowering; HBM streaming needs real DMA):

  (a) in-kernel PRNG measurement noise (ops/pallas_fft._render_postprocess,
      dispatched by models/simulator.render_scene) — statistical match to
      the XLA fallback's noise formula (zero mean, sigma = rms * 10^(-SNR/20)
      per mic) plus per-mic stream independence;
  (b) the HBM-streaming GCC input branch (ops/pallas_fft: manual
      double-buffered DMA, engaged when the whole-scene input block exceeds
      40 MB — >= 64 mics at nfft 65536) — numerical equality with the pure
      XLA correlation;
  (c) the whole-scene kernel design record (bfly_scene_windowed, unwired by
      design) vs the production render-kernel -> windowed-GCC-kernel split —
      near-identical TDOAs/estimates INCLUDING the in-kernel noise, which
      pins the per-mic seed mixing of both kernels to the same int32 Weyl
      stream (ADVICE r1 finding #1).

Run on the real TPU after any kernel change:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_kernel_check.py
Prints one JSON line per check and ALL OK / FAILURES; exit code 0/1.
"""
import functools
import os, json
import jax

os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models.simulator import render_scene
from pyaudiolocalization_tpu.ops import gccphat, pallas_fft
from pyaudiolocalization_tpu.parallel import SweepSpec
from pyaudiolocalization_tpu.parallel import sweep as sw

ok = True


def report(name, good, **fields):
    global ok
    ok &= bool(good)
    print(json.dumps({"check": name, **fields}), "OK" if good else "MISMATCH")


# ---------------------------------------------------------------------------
# (a) in-kernel noise statistics
# ---------------------------------------------------------------------------
def check_noise():
    fs, total, out, m, p = 16000.0, 8192, 6000, 4, 8
    rng = np.random.default_rng(3)
    base = jnp.asarray(rng.standard_normal(total), jnp.float32)
    delays = jnp.asarray(rng.uniform(0, 0.01, (m, p)), jnp.float32)
    gains = jnp.asarray(rng.uniform(0.1, 1.0, (m, p)), jnp.float32)
    snr_db = 20.0
    nfft = 8192
    assert pallas_fft.bfly_render_eligible(nfft, m, p, jnp.float32), \
        "config must take the fused render kernel"

    @jax.jit
    def pair(key):
        clean = render_scene(base, delays, gains, fs, total, out,
                             pad_mode="pow2", finalize=True)
        noisy = render_scene(base, delays, gains, fs, total, out,
                             pad_mode="pow2", finalize=True,
                             snr_db=snr_db, noise_key=key)
        return clean, noisy - clean

    clean, noise = pair(jax.random.PRNGKey(42))
    clean = np.asarray(clean)
    noise = np.asarray(noise)
    rms = np.sqrt(np.mean(clean * clean, -1))
    sigma = rms * 10.0 ** (-snr_db / 20.0)

    mean_z = np.abs(noise.mean(-1)) / (sigma / np.sqrt(out))  # ~N(0,1)
    std_rel = np.abs(noise.std(-1) / sigma - 1.0)
    # Per-mic streams must be distinct (cross-correlation ~ 1/sqrt(n)).
    nrm = noise / noise.std(-1, keepdims=True)
    xcorr = np.abs(np.triu(nrm @ nrm.T / out, 1)).max()
    # Determinism + key sensitivity.
    _, noise2 = pair(jax.random.PRNGKey(42))
    _, noise3 = pair(jax.random.PRNGKey(43))
    det = float(np.max(np.abs(np.asarray(noise2) - noise)))
    changed = float(np.max(np.abs(np.asarray(noise3) - noise)))
    good = (mean_z.max() < 5.0 and std_rel.max() < 0.05
            and xcorr < 5.0 / np.sqrt(out) and det == 0.0 and changed > 0.0)
    report("in_kernel_noise", good,
           max_mean_z=round(float(mean_z.max()), 3),
           max_std_rel_err=round(float(std_rel.max()), 4),
           max_cross_mic_corr=round(float(xcorr), 4),
           deterministic=det == 0.0, key_sensitive=changed > 0.0)


# ---------------------------------------------------------------------------
# (b) HBM-streaming GCC input branch
# ---------------------------------------------------------------------------
def check_hbm_streaming():
    m, nfft = 64, 65536
    n = nfft
    assert pallas_fft._bfly_gcc_hbm_input(nfft, m), \
        "config must engage the HBM-streaming input branch"
    assert pallas_fft.bfly_gcc_eligible(nfft, m, jnp.float32)
    rng = np.random.default_rng(11)
    sigs = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    # A spread of pairs including far-apart mic indices (stresses the DMA
    # schedule), kept small so the XLA reference fits comfortably.
    pi = np.arange(48, dtype=np.int32)
    pj = np.array([(i * 7 + 13) % m for i in range(48)], np.int32)
    fix = pj == pi
    pj[fix] = (pj[fix] + 1) % m

    @jax.jit
    def both(x):
        a = pallas_fft.bfly_gcc_all_pairs(x, pi, pj, nfft)
        b = gccphat.gcc_phat_all_pairs(x, pi, pj, nfft=nfft,
                                       use_pallas="never")
        d = jnp.max(jnp.abs(a - b))
        ref = jnp.max(jnp.abs(b))
        return d, ref

    d, ref = (float(np.asarray(v)) for v in both(sigs))
    good = d < 1e-4 * max(ref, 1.0) + 1e-5
    report("hbm_streaming_gcc", good, mics=m, nfft=nfft,
           max_abs_diff=float(d), ref_peak=float(ref))


# ---------------------------------------------------------------------------
# (c) whole-scene kernel vs production split, WITH noise
# ---------------------------------------------------------------------------
def check_scene_kernel():
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="noise",
                     source_box_lo=(0.2,) * 3, source_box_hi=(0.8,) * 3,
                     snr_db=(25.0, 25.0))
    mics = jnp.asarray(spec.mic_positions, jnp.float32)
    c = jnp.asarray(spec.speed_of_sound, jnp.float32)
    source = jnp.asarray([0.62, 0.31, 0.47], jnp.float32)
    snr_db = jnp.asarray(25.0, jnp.float32)

    @jax.jit
    def run(k):
        k_sim, k_est = jax.random.split(k)
        mono = sw._sim_est_fused(spec, source, mics, c, snr_db,
                                 k_sim, k_est, jnp.float32)
        sigs = sw._simulate(spec, source[None], mics, c, snr_db, k_sim,
                            jnp.float32)
        split = sw._estimate(spec, sigs, mics, c, k_est)
        return mono, split

    (xm, cm, tdm), (xs, cs, tds) = run(jax.random.PRNGKey(77))
    d_td = float(np.max(np.abs(np.asarray(tdm) - np.asarray(tds)))) * spec.fs
    d_est = float(np.linalg.norm(np.asarray(xm) - np.asarray(xs)))
    good = d_td < 0.5 and d_est < 1e-3
    report("scene_kernel_with_noise", good,
           max_td_diff_samples=round(d_td, 4),
           est_diff_m=round(d_est, 6))


# ---------------------------------------------------------------------------
# (d) noise-null bootstrap kernel (bootstrap_mode='noise'): the in-kernel
# uniform-noise draws cannot run in CPU interpret mode (prng_seed), so the
# distribution-equality claim vs the sort-based permutation path is pinned
# HERE: same signals, same draw count, thresholds within Monte-Carlo error;
# plus determinism and key sensitivity of the kernel stream.
# ---------------------------------------------------------------------------
def check_noise_bootstrap():
    from pyaudiolocalization_tpu.models import tdoa
    rng = np.random.default_rng(9)
    n = 4000
    sig1 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    sig2 = jnp.asarray(0.5 * np.asarray(sig1)
                       + rng.standard_normal(n) * 0.8, jnp.float32)
    nfft = 8192
    B = 400

    @functools.partial(jax.jit, static_argnames=("mode",))
    def thr(key, mode):
        return tdoa.bootstrap_significance(sig1, sig2, key, num_bootstrap=B,
                                           nfft=nfft, bootstrap_mode=mode)

    perm = np.mean([float(thr(jax.random.PRNGKey(50 + i), "permutation"))
                    for i in range(3)])
    noise = np.mean([float(thr(jax.random.PRNGKey(60 + i), "noise"))
                     for i in range(3)])
    rel = abs(perm - noise) / perm
    a = float(thr(jax.random.PRNGKey(70), "noise"))
    b = float(thr(jax.random.PRNGKey(70), "noise"))
    c = float(thr(jax.random.PRNGKey(71), "noise"))
    good = rel < 0.05 and a == b and a != c
    report("noise_bootstrap", good, perm_thr=round(perm, 5),
           noise_thr=round(noise, 5), rel_diff=round(rel, 4),
           deterministic=a == b, key_sensitive=a != c)


check_noise()
check_hbm_streaming()
check_scene_kernel()
check_noise_bootstrap()
print("ALL OK" if ok else "FAILURES")
raise SystemExit(0 if ok else 1)
