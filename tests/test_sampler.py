"""Sampler tests: sampling-math semantics, KV-cache/chunked equivalence, and
token-identical parity with the reference generate() loop (with injected
uniforms, since torch and JAX PRNG streams differ by construction)."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.ops.sampling import SamplingParams, sample_step
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

TINY = dict(
    vocab_size=1007,
    n_layer=2,
    n_head=4,
    d_model=64,
    d_inner=128,
    d_condition=16,
    max_seq=256,
    dropout=0.0,
)


# ---------------------------------------------------------------------------
# sample_step unit semantics
# ---------------------------------------------------------------------------


def _step(logits, temp_key=5, counts=0, u=0.5, **kw):
    params = SamplingParams(
        temperatures=kw.pop("temperatures", (1.0, 1.0)),
        top_k=kw.pop("top_k", -1),
        top_p=kw.pop("top_p", 0.0),
        penalty_coeff=kw.pop("penalty_coeff", 0.0),
    )
    V = logits.shape[-1]
    exclude = np.zeros(V, bool)
    exclude[kw.pop("exclude", [])] = True
    tok, counts = sample_step(
        jnp.asarray(logits),
        jnp.asarray([temp_key], jnp.int32),
        jnp.asarray([counts], jnp.int32),
        jnp.asarray([u], jnp.float32),
        jnp.asarray(exclude),
        kw.pop("ts_range", (882, 1007)),
        params,
    )
    return int(tok[0]), int(counts[0])


def test_greedy_via_topk1():
    logits = np.array([[0.1, 3.0, 0.2, -1.0]], np.float32)
    tok, _ = _step(logits, top_k=1)
    assert tok == 1


def test_exclusion():
    logits = np.array([[0.1, 3.0, 0.2, -1.0]], np.float32)
    tok, _ = _step(logits, top_k=1, exclude=[1])
    assert tok == 2


def test_nan_zeroing():
    logits = np.array([[np.nan, 3.0, 0.2, -1.0]], np.float32)
    tok, _ = _step(logits, top_k=1)
    assert tok == 1  # nan -> 0, argmax still 1


def test_top_p_restricts_support():
    # one dominant logit: top-p=0.5 keeps only it
    logits = np.array([[10.0, 0.0, 0.0, 0.0]], np.float32)
    for u in (0.01, 0.5, 0.999):
        tok, _ = _step(logits, top_p=0.5, u=u)
        assert tok == 0


def test_repeat_count_update():
    # support of 1 (after top-p) -> count increments
    logits = np.array([[10.0, 0.0, 0.0, 0.0]], np.float32)
    _, c = _step(logits, top_p=0.5, counts=3)
    assert c == 4
    # broad support -> halves
    logits = np.array([[0.0, 0.0, 0.0, 0.0]], np.float32)
    _, c = _step(logits, counts=5)
    assert c == 2


def test_dual_temperature():
    """With a TIMESHIFT previous token temps[0] applies, else temps[1]; a
    high rest-temperature flattens the distribution enough to flip an
    inverse-CDF draw."""
    logits = np.array([[2.0, 0.0, 0.0, 0.0]], np.float32)
    # temp_key below ts range -> temps[1]=100 -> nearly uniform -> u=0.9 picks last-ish
    tok_flat, _ = _step(logits, temperatures=(1.0, 100.0), ts_range=(2, 3), u=0.9)
    # temp_key inside ts range (=2) -> temps[0]=1 -> peaked -> u=0.9 stays on argmax
    tok_peak, _ = _step(
        logits, temp_key=2, temperatures=(0.101, 100.0), ts_range=(2, 3), u=0.6
    )
    assert tok_peak == 0
    assert tok_flat != 0


def test_penalty_raises_temperature():
    # counts=31 -> mult = log(8)=2.08 * coeff
    logits = np.array([[5.0, 0.0, 0.0, 0.0]], np.float32)
    tok_no, _ = _step(logits, penalty_coeff=0.0, counts=31, u=0.7)
    tok_pen, _ = _step(logits, penalty_coeff=5.0, counts=31, u=0.7)
    assert tok_no == 0 and tok_pen != 0


# ---------------------------------------------------------------------------
# end-to-end sampler
# ---------------------------------------------------------------------------


def _make_sampler(mode, gen_len, max_input_len=64, slide_hop=None, **kw):
    cfg = ModelConfig(mode=mode, **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(42))
    sp = SamplingParams(
        gen_len=gen_len, max_input_len=max_input_len, seed=7, **kw
    )
    return Sampler(model, params, DEFAULT_VOCAB, sp, slide_hop=slide_hop)


def test_generate_shapes_and_no_specials():
    s = _make_sampler("continuous_concat", gen_len=20)
    primers = np.ones((3, 1), np.int32)  # <START>
    cond = np.array([[0.8, 0.8], [-0.8, 0.8], [0.0, -0.5]], np.float32)
    song = s.generate(primers, continuous_conditions=cond)
    assert song.shape == (3, 20)
    assert (song[:, 0] == 1).all()
    # no special tokens ever sampled
    sampled = song[:, 1:]
    assert (sampled >= 2).all() and (sampled < 1007).all()


def test_generate_deterministic_given_seed():
    s = _make_sampler("none", gen_len=16)
    primers = np.ones((2, 1), np.int32)
    a = s.generate(primers)
    b = s.generate(primers)
    np.testing.assert_array_equal(a, b)


def test_chunked_sliding_matches_unchunked_prefix():
    """With gen_len > window the sampler refreshes in hops; the tokens
    produced before the first refresh must equal the unchunked run's."""
    primers = np.ones((2, 1), np.int32)
    short = _make_sampler("none", gen_len=24, max_input_len=64)
    long_ = _make_sampler("none", gen_len=100, max_input_len=64, slide_hop=16)
    a = short.generate(primers)
    b = long_.generate(primers)
    assert b.shape == (2, 100)
    np.testing.assert_array_equal(a, b[:, :24])
    assert (b[:, 1:] >= 2).all() and (b[:, 1:] < 1007).all()


def test_discrete_prefix_not_emitted():
    vocab = DEFAULT_VOCAB.with_extra_tokens(["<A-2>", "<A2>", "<V-2>", "<V2>"])
    cfg = ModelConfig(mode="discrete_token", **{**TINY, "vocab_size": 1011})
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    sp = SamplingParams(gen_len=12, max_input_len=48, seed=3)
    s = Sampler(model, params, vocab, sp)
    primers = np.ones((2, 1), np.int32)
    prefix = np.array([[1009, 1007], [1010, 1008]], np.int32)
    song = s.generate(primers, discrete_prefix_ids=prefix)
    assert song.shape == (2, 12)
    assert (song[:, 1:] < 1007).all()  # specials excluded from sampling


# ---------------------------------------------------------------------------
# token-identical parity with the reference loop
# ---------------------------------------------------------------------------


def _setup_reference_generate():
    import sys
    import types

    for stub in ("pypianoroll", "pretty_midi"):
        sys.modules.setdefault(stub, types.ModuleType(stub))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import generate as ref_generate

    return ref_generate


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
@pytest.mark.parametrize(
    "mode,topk,topp",
    [
        # flagship mode stays in the fast suite as the smoke config; the
        # other three are slow-marked (VERDICT r4 item 8: the 7-config
        # token-identical scan dominated the default run)
        pytest.param("none", 1, 0.0, marks=pytest.mark.slow),  # greedy
        pytest.param("none", -1, 0.7, marks=pytest.mark.slow),  # nucleus
        ("continuous_concat", -1, 0.7),
        pytest.param("continuous_token", 20, 0.9, marks=pytest.mark.slow),
    ],
)
def test_token_identical_vs_reference(mode, topk, topp):
    """Run the ACTUAL reference generate() (torch, CPU) with
    torch.multinomial monkeypatched to the documented inverse-CDF draw over
    shared uniforms, and compare token-for-token with our sampler."""
    import torch

    ref_generate = _setup_reference_generate()
    import models.music_multi as ref_multi
    import models.music_continuous_token as ref_ct

    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    gen_len = 24
    B = 2
    torch.manual_seed(11)
    cfg = ModelConfig(mode=mode, **TINY, remat=False)
    if mode == "continuous_token":
        ref_model = ref_ct.MusicTransformerContinuousToken(
            embedding_dim=cfg.d_model, d_inner=cfg.d_inner,
            vocab_size=cfg.vocab_size, num_layer=cfg.n_layer,
            num_head=cfg.n_head, max_seq=cfg.max_seq, dropout=0.0, pad_token=0,
        ).eval()
    else:
        d_cond = cfg.effective_d_condition if mode == "continuous_concat" else -1
        ref_model = ref_multi.MusicTransformerMulti(
            embedding_dim=cfg.d_model, d_inner=cfg.d_inner, d_condition=d_cond,
            vocab_size=cfg.vocab_size, num_layer=cfg.n_layer,
            num_head=cfg.n_head, max_seq=cfg.max_seq, dropout=0.0, pad_token=0,
        ).eval()

    params = torch_state_dict_to_params(ref_model.state_dict(), cfg)
    maps = DEFAULT_VOCAB.get_maps()

    rng = np.random.RandomState(5)
    # the reference draws gen_len times but discards the final sample
    # (generate.py:99,183); our sampler never makes that last draw
    uniforms = rng.uniform(size=(gen_len, B)).astype(np.float32)

    # --- run the reference loop with injected uniforms ------------------
    draw_idx = {"i": 0}

    def fake_multinomial(probs, n, replacement=True):
        u = torch.from_numpy(uniforms[draw_idx["i"]]).to(probs.dtype)
        draw_idx["i"] += 1
        cum = torch.cumsum(probs, dim=-1)
        idx = torch.argmax((cum >= u[:, None]).int(), dim=-1, keepdim=True)
        return idx

    captured = []
    orig_str = ref_generate.ind_tensor_to_str

    def capture_str(x, *a, **k):
        captured.append(x.cpu().numpy().copy())
        return orig_str(x, *a, **k)

    conds = [[0.8, -0.5], [-0.3, 0.9]]
    orig_multinomial = torch.multinomial
    torch.multinomial = fake_multinomial
    ref_generate.ind_tensor_to_str = capture_str
    try:
        ref_generate.generate(
            ref_model, maps, torch.device("cpu"), out_dir="/tmp/x",
            conditioning=mode, debug=True, verbose=False, amp=False,
            gen_len=gen_len, max_input_len=64, temperatures=[1.2, 1.4],
            top_k=topk, top_p=topp, penalty_coeff=0.5,
            continuous_conditions=conds if mode != "none" else None,
            min_n_instruments=99,  # force the not-saving branch: the stubbed
            # pretty_midi can't build Instruments; capture happens before
            primers=[["<START>"]] if mode != "none" else [["<START>"], ["<START>"]],
        )
    finally:
        torch.multinomial = orig_multinomial
        ref_generate.ind_tensor_to_str = orig_str

    # the reference samples gen_len times but discards the final draw;
    # our sampler draws gen_len-1 times. Trim the unused final uniform.
    ref_song = np.stack(captured, axis=1)  # [T, B]

    # --- our sampler ------------------------------------------------------
    model = MusicTransformer(cfg)
    sp = SamplingParams(
        gen_len=gen_len, max_input_len=64, temperatures=(1.2, 1.4),
        top_k=topk, top_p=topp, penalty_coeff=0.5,
    )
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp)
    song = sampler.generate(
        np.ones((B, 1), np.int32),
        continuous_conditions=np.array(conds, np.float32)
        if mode != "none"
        else None,
        uniforms=uniforms[:-1],
    )
    np.testing.assert_array_equal(song.T, ref_song)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_token_identical_vs_reference_discrete():
    """discrete_token parity: per-step condition-prefix re-prepend
    (generate.py:105-107) AND the window shrink (generate.py:80-82) -- the
    generation runs past max_input_len so the sliding region is covered
    (slide_hop=1 = reference-exact slide)."""
    import torch

    ref_generate = _setup_reference_generate()
    import models.music_multi as ref_multi

    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    emotion_tokens = ["<V-2>", "<V2>", "<A-2>", "<A2>"]
    vocab = DEFAULT_VOCAB.with_extra_tokens(emotion_tokens)
    gen_len, B = 40, 2
    max_input_len = 24  # < gen_len: forces the sliding-window path
    torch.manual_seed(13)
    cfg = ModelConfig(mode="discrete_token", **{**TINY, "vocab_size": len(vocab)},
                      remat=False)
    ref_model = ref_multi.MusicTransformerMulti(
        embedding_dim=cfg.d_model, d_inner=cfg.d_inner, d_condition=-1,
        vocab_size=cfg.vocab_size, num_layer=cfg.n_layer,
        num_head=cfg.n_head, max_seq=cfg.max_seq, dropout=0.0, pad_token=0,
    ).eval()
    params = torch_state_dict_to_params(ref_model.state_dict(), cfg)
    maps = vocab.get_maps()

    discrete_conditions = [["<V-2>", "<A2>"], ["<V2>", "<A-2>"]]
    rng = np.random.RandomState(17)
    uniforms = rng.uniform(size=(gen_len, B)).astype(np.float32)

    draw_idx = {"i": 0}

    def fake_multinomial(probs, n, replacement=True):
        u = torch.from_numpy(uniforms[draw_idx["i"]]).to(probs.dtype)
        draw_idx["i"] += 1
        cum = torch.cumsum(probs, dim=-1)
        return torch.argmax((cum >= u[:, None]).int(), dim=-1, keepdim=True)

    captured = []
    orig_str = ref_generate.ind_tensor_to_str

    def capture_str(x, *a, **k):
        captured.append(x.cpu().numpy().copy())
        return orig_str(x, *a, **k)

    orig_multinomial = torch.multinomial
    torch.multinomial = fake_multinomial
    ref_generate.ind_tensor_to_str = capture_str
    try:
        ref_generate.generate(
            ref_model, maps, torch.device("cpu"), out_dir="/tmp/x",
            conditioning="discrete_token", debug=True, verbose=False,
            amp=False, gen_len=gen_len, max_input_len=max_input_len,
            temperatures=[1.2, 1.4], top_k=-1, top_p=0.7, penalty_coeff=0.5,
            discrete_conditions=discrete_conditions, min_n_instruments=99,
            primers=[["<START>"]],
        )
    finally:
        torch.multinomial = orig_multinomial
        ref_generate.ind_tensor_to_str = orig_str

    ref_song = np.stack(captured, axis=1)  # [T, B]

    model = MusicTransformer(cfg)
    sp = SamplingParams(
        gen_len=gen_len, max_input_len=max_input_len,
        temperatures=(1.2, 1.4), top_k=-1, top_p=0.7, penalty_coeff=0.5,
    )
    sampler = Sampler(model, params, vocab, sp, slide_hop=1)
    prefix = np.array(
        [[maps["tuple2idx"][s] for s in c] for c in discrete_conditions],
        np.int32,
    )
    song = sampler.generate(
        np.ones((B, 1), np.int32),
        discrete_prefix_ids=prefix,
        uniforms=uniforms[:-1],
    )
    np.testing.assert_array_equal(song.T, ref_song)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
@pytest.mark.slow
@pytest.mark.parametrize("mode", ["continuous_concat", "continuous_token"])
def test_token_identical_varying_conditions(mode):
    """Per-step interpolated conditions (generate.py:35-36, 110-113): the
    reference re-embeds the whole window under the CURRENT condition each
    step, so parity requires the exact (full-forward-per-token) path."""
    import torch

    ref_generate = _setup_reference_generate()
    import models.music_multi as ref_multi
    import models.music_continuous_token as ref_ct

    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    gen_len, B = 24, 2
    torch.manual_seed(23)
    cfg = ModelConfig(mode=mode, **TINY, remat=False)
    if mode == "continuous_token":
        ref_model = ref_ct.MusicTransformerContinuousToken(
            embedding_dim=cfg.d_model, d_inner=cfg.d_inner,
            vocab_size=cfg.vocab_size, num_layer=cfg.n_layer,
            num_head=cfg.n_head, max_seq=cfg.max_seq, dropout=0.0, pad_token=0,
        ).eval()
    else:
        ref_model = ref_multi.MusicTransformerMulti(
            embedding_dim=cfg.d_model, d_inner=cfg.d_inner,
            d_condition=cfg.effective_d_condition, vocab_size=cfg.vocab_size,
            num_layer=cfg.n_layer, num_head=cfg.n_head, max_seq=cfg.max_seq,
            dropout=0.0, pad_token=0,
        ).eval()
    params = torch_state_dict_to_params(ref_model.state_dict(), cfg)
    maps = DEFAULT_VOCAB.get_maps()

    rng = np.random.RandomState(29)
    uniforms = rng.uniform(size=(gen_len, B)).astype(np.float32)
    valences = np.linspace(-0.9, 0.9, gen_len, dtype=np.float32)
    arousals = np.linspace(0.8, -0.8, gen_len, dtype=np.float32)
    vc = np.stack(
        [np.stack([valences, arousals], axis=-1)] * B
    )  # [B, gen_len, 2]

    draw_idx = {"i": 0}

    def fake_multinomial(probs, n, replacement=True):
        u = torch.from_numpy(uniforms[draw_idx["i"]]).to(probs.dtype)
        draw_idx["i"] += 1
        cum = torch.cumsum(probs, dim=-1)
        return torch.argmax((cum >= u[:, None]).int(), dim=-1, keepdim=True)

    captured = []
    orig_str = ref_generate.ind_tensor_to_str

    def capture_str(x, *a, **k):
        captured.append(x.cpu().numpy().copy())
        return orig_str(x, *a, **k)

    orig_multinomial = torch.multinomial
    torch.multinomial = fake_multinomial
    ref_generate.ind_tensor_to_str = capture_str
    try:
        ref_generate.generate(
            ref_model, maps, torch.device("cpu"), out_dir="/tmp/x",
            conditioning=mode, debug=True, verbose=False, amp=False,
            gen_len=gen_len, max_input_len=64, temperatures=[1.2, 1.4],
            top_k=-1, top_p=0.7, penalty_coeff=0.5,
            varying_condition=[
                torch.from_numpy(np.stack([valences] * B)),
                torch.from_numpy(np.stack([arousals] * B)),
            ],
            # ignored for generation when varying_condition is set, but its
            # absence crashes the reference's own redo bookkeeping
            # (generate.py:247 subscripts None)
            continuous_conditions=torch.zeros(B, 2),
            min_n_instruments=99, primers=[["<START>"]],
        )
    finally:
        torch.multinomial = orig_multinomial
        ref_generate.ind_tensor_to_str = orig_str

    ref_song = np.stack(captured, axis=1)  # [T, B]

    model = MusicTransformer(cfg)
    sp = SamplingParams(
        gen_len=gen_len, max_input_len=64, temperatures=(1.2, 1.4),
        top_k=-1, top_p=0.7, penalty_coeff=0.5,
    )
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp)
    song = sampler.generate_exact(
        np.ones((B, 1), np.int32),
        varying_conditions=vc,
        uniforms=uniforms[:-1],
    )
    np.testing.assert_array_equal(song.T, ref_song)
