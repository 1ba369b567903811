import numpy as np
import pytest

from diffsim_tpu.core import schedulers as S


def test_pndm_table_values():
    t = S.pndm_timestep_table(1000)
    assert len(t) == 1001
    # [1000, 999, 999, 998, ..., 1]
    assert t[0] == 1000 and t[1] == 999 and t[2] == 999 and t[3] == 998 and t[-1] == 1
    # canonical CUTE config: target_step=600 -> DDPM t=401
    assert t[600] == 401
    assert t[500] == 501 and t[900] == 101


def test_sd15_noise_spec_is_q_sample():
    spec = S.sd15_noise_spec(600)
    assert spec.model_t == 401.0
    assert spec.a**2 + spec.b**2 == pytest.approx(1.0, abs=1e-12)
    ac = S.alphas_cumprod("scaled_linear")[401]
    assert spec.a == pytest.approx(np.sqrt(ac))


def test_sd15_t0_clamps_instead_of_crashing():
    spec = S.sd15_noise_spec(0)
    assert spec.model_t == 1000.0
    ac = S.alphas_cumprod("scaled_linear")[999]
    assert spec.a == pytest.approx(np.sqrt(ac))


def test_sdxl_noise_spec_amplifies_signal():
    spec = S.sdxl_noise_spec(900)  # canonical Sref/TID step
    assert spec.model_t == 100.0
    ac = S.alphas_cumprod("scaled_linear")[100]
    # a = init_noise_sigma * sqrt(alpha_bar): the reference's prepare_latents amplification
    assert spec.a == pytest.approx(S.euler_init_noise_sigma() * np.sqrt(ac), rel=1e-9)
    assert spec.b == pytest.approx(np.sqrt(1 - ac), rel=1e-6)
    assert S.euler_init_noise_sigma() > 14  # SD sigma_max ~ 14.6


def test_space_timesteps_uniform():
    st = S.space_timesteps(1000, [600])
    assert len(st) == 600
    assert st[0] == 0 and st[-1] == 999
    assert st == sorted(set(st))
    # respaced model timestep for the DiT path at target_step=600
    assert S.dit_noise_spec(600).model_t == float(st[1000 - 600])


def test_dit_noise_spec_rejects_small_steps():
    with pytest.raises(ValueError):
        S.dit_noise_spec(400)


def test_dit_noising_uses_scaled_linear_at_raw_t():
    spec = S.dit_noise_spec(750)
    ac = S.alphas_cumprod("scaled_linear")[750]
    assert spec.a == pytest.approx(np.sqrt(ac))


def test_alphas_cumprod_monotone():
    for sched in ("scaled_linear", "linear"):
        ac = S.alphas_cumprod(sched)
        assert ac.shape == (1000,)
        assert np.all(np.diff(ac) < 0)
        assert 0 < ac[-1] < ac[0] < 1
