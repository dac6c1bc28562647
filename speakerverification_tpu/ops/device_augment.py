"""Batched on-device env-corrupt augmentation (TPU-first alternative).

The reference augments on the host, one utterance at a time
(src/processing/audio_loader.py:158-244 ``AugmentWAV`` + the
rev/noise/both/none chain in src/dataloader.py:113-144). Measured here
(bench_host_pipeline.py): env_corrupt costs ~6.7× a bare decode
(687 vs 4,608 utt/s/core) — fine for a many-core host, but it burns CPU
the accelerator could absorb for free.

This module keeps the host path as the parity path and offers a
device-side equivalent with static shapes, fused into the train step:

* Noise/RIR clips are pre-loaded ONCE into device banks
  (``build_banks``) — crops at ``max_audio`` length, with per-clip
  precomputed dB and per-clip SNR ranges drawn from the reference's
  per-category settings.
* ``device_env_corrupt`` draws the same rev/noise/both/none mix
  (.2/.4/.2/.2) per utterance and applies SNR-scaled additive mixing
  (audio_loader.py:216-235 dB/gain formula) and full FFT reverberation
  (energy-normalized RIR, truncated to the crop, :237-244) entirely
  inside the XLA program. Both branches are computed batched and
  selected per-utterance — a few rFFTs of 2·max_audio, negligible next
  to the model's FLOPs.

Documented deltas vs the host path (distribution-level, not semantics):
one noise clip per mix (the reference draws 1..k files per category),
and sampling is over the preloaded bank rather than the full corpus —
the Trainer passes banks as step ARGUMENTS and resamples them from the
corpus every epoch (`build_banks(..., rng)`, fixed shapes, so the
jitted step never recompiles), bounding the bank-vs-corpus delta.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AugmentBanks", "build_banks", "device_env_corrupt"]

# rev / noise / both / none (src/dataloader.py:113-144)
_ENV_PROBS = jnp.asarray([0.2, 0.4, 0.2, 0.2])


class AugmentBanks(NamedTuple):
    noise: jax.Array       # [N, L] crops
    noise_db: jax.Array    # [N] 10·log10(mean²+1e-4)
    snr_lo: jax.Array      # [N] per-clip SNR range (category-dependent)
    snr_hi: jax.Array      # [N]
    rir: jax.Array         # [R, Lr] energy-normalized RIRs


def build_banks(augmentor, n_noise: int = 256, n_rir: int = 64,
                rng: Optional[np.random.Generator] = None) -> AugmentBanks:
    """Sample noise/RIR files through a host ``AugmentWav`` into device
    banks. Clips are random-cropped to ``max_audio``; categories are
    drawn with the configured ``noise_proportion``; each clip carries
    its category's SNR range. Call once per epoch to cycle files."""
    from speakerverification_tpu.data.audio import load_wav
    from speakerverification_tpu.data.augment import NOISE_CATEGORIES

    rng = rng or np.random.default_rng()
    spec = augmentor.spec
    L = augmentor.max_audio

    cats = [c for c in NOISE_CATEGORIES if augmentor.noiselist.get(c)]
    if not cats:
        raise ValueError("augmentor has no noise files")
    probs = np.array([augmentor.noise_proportion[NOISE_CATEGORIES.index(c)]
                      for c in cats])
    probs = probs / probs.sum()

    noise = np.zeros((n_noise, L), np.float32)
    lo = np.zeros(n_noise, np.float32)
    hi = np.zeros(n_noise, np.float32)
    for i in range(n_noise):
        cat = str(rng.choice(cats, p=probs))
        files = augmentor.noiselist[cat]
        f = files[int(rng.integers(len(files)))]
        noise[i] = load_wav(f, spec, evalmode=False, rng=rng)[0]
        lo[i], hi[i] = augmentor.noise_snr[cat]
    noise_db = 10.0 * np.log10(np.mean(noise ** 2, axis=1) + 1e-4)

    if not augmentor.reverberation_files:
        raise ValueError("augmentor has no RIR files")
    # Fixed bank width L keeps the shape identical across per-epoch
    # refreshes (no step recompile). Truncating an RIR to L taps is
    # EXACT for the convolution output's first L samples (out[t] only
    # reads rir[k<=t], t < L) — and the device path truncates to the
    # crop length anyway (audio_loader.py:237-244 semantics).
    rir = np.zeros((n_rir, L), np.float32)
    for i in range(n_rir):
        f = augmentor.reverberation_files[
            int(rng.integers(len(augmentor.reverberation_files)))]
        r = load_wav(f, spec, load_all=True)[0]
        r = r / np.sqrt(np.sum(r ** 2) + 1e-12)
        rir[i, :min(len(r), L)] = r[:L]

    return AugmentBanks(jnp.asarray(noise), jnp.asarray(noise_db),
                        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(rir))


def _mix_noise(wave, noise, noise_db, snr):
    """SNR-scaled additive mixing, audio_loader.py:216-235 formula."""
    clean_db = 10.0 * jnp.log10(jnp.mean(wave ** 2, axis=-1) + 1e-4)
    gain = jnp.sqrt(10.0 ** ((clean_db - noise_db - snr) / 10.0))
    return wave + gain[:, None] * noise


def _reverberate(wave, rir):
    """Full FFT convolution truncated to the crop (audio_loader.py:237-244).

    ``wave`` [B, L], ``rir`` [B, Lr] (already energy-normalized)."""
    L = wave.shape[-1]
    n = L + rir.shape[-1] - 1
    wf = jnp.fft.rfft(wave, n=n)
    rf = jnp.fft.rfft(rir, n=n)
    return jnp.fft.irfft(wf * rf, n=n)[..., :L].astype(wave.dtype)


def device_env_corrupt(wave: jax.Array, banks: AugmentBanks,
                       rng: jax.Array) -> jax.Array:
    """Per-utterance rev/noise/both/none corruption, fully on device.

    ``wave``: [B, L] (or [B, n_per, L] — flattened internally). Static
    shapes; jit/shard_map-safe (split the rng per step and per shard).
    """
    shape = wave.shape
    x = wave.reshape(-1, shape[-1])
    B = x.shape[0]
    k_type, k_noise, k_snr, k_rir, k_order = jax.random.split(rng, 5)

    augtype = jax.random.categorical(
        k_type, jnp.log(_ENV_PROBS), shape=(B,))            # 0=rev 1=noise
    ni = jax.random.randint(k_noise, (B,), 0, banks.noise.shape[0])
    snr = jax.random.uniform(k_snr, (B,), minval=banks.snr_lo[ni],
                             maxval=banks.snr_hi[ni])
    noise = banks.noise[ni]
    ndb = banks.noise_db[ni]
    ri = jax.random.randint(k_rir, (B,), 0, banks.rir.shape[0])
    rir = banks.rir[ri]

    rev = _reverberate(x, rir)
    noised = _mix_noise(x, noise, ndb, snr)
    # 'both' in a random order (src/dataloader.py both-branch coin flip);
    # the noise gain re-reads its INPUT's dB, matching the host chain
    rev_then_noise = _mix_noise(rev, noise, ndb, snr)
    noise_then_rev = _reverberate(noised, rir)
    both = jnp.where(jax.random.bernoulli(k_order, 0.5, (B,))[:, None],
                     rev_then_noise, noise_then_rev)

    out = jnp.where((augtype == 0)[:, None], rev, x)
    out = jnp.where((augtype == 1)[:, None], noised, out)
    out = jnp.where((augtype == 2)[:, None], both, out)
    return out.reshape(shape)
