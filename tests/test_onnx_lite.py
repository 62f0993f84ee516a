"""onnx_lite parser/executor tests (torch-parity, no onnx package) + DNSMOS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_max_tpu.utils import onnx_lite as ox

torch = pytest.importorskip("torch")


def _build_and_parse(nodes, inputs, outputs, inits=None):
    data = ox.build_model_bytes(nodes, inputs, outputs, inits)
    return ox.parse_model(data)


def test_tensor_roundtrip_dtypes():
    rng = np.random.default_rng(0)
    for arr in [
        rng.standard_normal((3, 4)).astype(np.float32),
        rng.integers(-5, 5, (2, 3)).astype(np.int64),
        rng.integers(0, 2, (4,)).astype(np.bool_),
    ]:
        g = _build_and_parse(
            [ox.encode_node("Identity", ["x"], ["y"])], ["x"], ["y"], {"x": arr}
        )
        np.testing.assert_array_equal(g.initializers["x"], arr)


def test_conv_relu_pool_gemm_vs_torch():
    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Conv2d(2, 4, 3, stride=2, padding=1),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Flatten(),
        torch.nn.Linear(4 * 3 * 3, 5),
        torch.nn.Sigmoid(),
    ).eval()
    x = torch.randn(2, 2, 12, 12)
    with torch.no_grad():
        ref = net(x).numpy()

    conv, lin = net[0], net[4]
    inits = {
        "w": conv.weight.detach().numpy(),
        "b": conv.bias.detach().numpy(),
        "lw": lin.weight.detach().numpy(),
        "lb": lin.bias.detach().numpy(),
    }
    nodes = [
        ox.encode_node(
            "Conv", ["x", "w", "b"], ["c"],
            kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1],
        ),
        ox.encode_node("Relu", ["c"], ["r"]),
        ox.encode_node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        ox.encode_node("Flatten", ["p"], ["f"], axis=1),
        ox.encode_node("Gemm", ["f", "lw", "lb"], ["g"], transB=1),
        ox.encode_node("Sigmoid", ["g"], ["y"]),
    ]
    g = _build_and_parse(nodes, ["x"], ["y"], inits)
    (out,) = ox.run(g, {"x": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv1d_groups_and_avgpool_vs_torch():
    torch.manual_seed(1)
    net = torch.nn.Sequential(
        torch.nn.Conv1d(4, 8, 5, padding=2, groups=2),
        torch.nn.AvgPool1d(3, stride=3),
    ).eval()
    x = torch.randn(1, 4, 30)
    with torch.no_grad():
        ref = net(x).numpy()
    conv = net[0]
    nodes = [
        ox.encode_node(
            "Conv", ["x", "w", "b"], ["c"],
            kernel_shape=[5], pads=[2, 2], group=2,
        ),
        ox.encode_node("AveragePool", ["c"], ["y"], kernel_shape=[3], strides=[3]),
    ]
    g = _build_and_parse(
        nodes, ["x"], ["y"],
        {"w": conv.weight.detach().numpy(), "b": conv.bias.detach().numpy()},
    )
    (out,) = ox.run(g, {"x": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_batchnorm_softmax_reduce_vs_torch():
    torch.manual_seed(2)
    bn = torch.nn.BatchNorm2d(3).eval()
    bn.running_mean.uniform_(-1, 1)
    bn.running_var.uniform_(0.5, 2)
    bn.weight.data.uniform_(0.5, 2)
    bn.bias.data.uniform_(-1, 1)
    x = torch.randn(2, 3, 4, 4)
    with torch.no_grad():
        ref = torch.softmax(bn(x).mean(dim=(2, 3)), dim=-1).numpy()
    nodes = [
        ox.encode_node("BatchNormalization", ["x", "s", "b", "m", "v"], ["n"]),
        ox.encode_node("ReduceMean", ["n"], ["r"], axes=[2, 3], keepdims=0),
        ox.encode_node("Softmax", ["r"], ["y"], axis=-1),
    ]
    g = _build_and_parse(
        nodes, ["x"], ["y"],
        {
            "s": bn.weight.detach().numpy(),
            "b": bn.bias.detach().numpy(),
            "m": bn.running_mean.numpy(),
            "v": bn.running_var.numpy(),
        },
    )
    (out,) = ox.run(g, {"x": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_shape_gather_reshape_is_jit_safe():
    """Shape -> Gather -> Concat -> Reshape stays concrete under jax.jit."""
    nodes = [
        ox.encode_node("Shape", ["x"], ["sh"]),
        ox.encode_node("Gather", ["sh", "i0"], ["d0"], axis=0),
        ox.encode_node("Concat", ["d0", "neg1"], ["tgt"], axis=0),
        ox.encode_node("Reshape", ["x", "tgt"], ["y"]),
    ]
    g = _build_and_parse(
        nodes, ["x"], ["y"],
        {
            "i0": np.asarray([0], np.int64),
            "neg1": np.asarray([-1], np.int64),
        },
    )
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    (eager,) = ox.run(g, {"x": jnp.asarray(x)})
    (jitted,) = jax.jit(lambda a: ox.run(g, {"x": a}))(jnp.asarray(x))
    assert eager.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(jitted), np.asarray(eager))


def test_pad_slice_clip_ops():
    nodes = [
        ox.encode_node("Pad", ["x"], ["p"], pads=[0, 1, 0, 1], mode=b"constant"),
        ox.encode_node("Slice", ["p"], ["s"], starts=[0], ends=[3], axes=[1]),
        ox.encode_node("Clip", ["s"], ["y"], min=0.0, max=1.0),
    ]
    g = _build_and_parse(nodes, ["x"], ["y"])
    x = np.asarray([[-1.0, 0.5, 2.0]], np.float32)
    (out,) = ox.run(g, {"x": jnp.asarray(x)})
    np.testing.assert_allclose(
        np.asarray(out), [[0.0, 0.0, 0.5]], atol=1e-7
    )


def test_same_upper_autopad_matches_torch_same():
    torch.manual_seed(3)
    conv = torch.nn.Conv2d(1, 2, 3, padding="same").eval()
    x = torch.randn(1, 1, 7, 9)
    with torch.no_grad():
        ref = conv(x).numpy()
    nodes = [
        ox.encode_node(
            "Conv", ["x", "w", "b"], ["y"],
            kernel_shape=[3, 3], auto_pad=b"SAME_UPPER",
        )
    ]
    g = _build_and_parse(
        nodes, ["x"], ["y"],
        {"w": conv.weight.detach().numpy(), "b": conv.bias.detach().numpy()},
    )
    (out,) = ox.run(g, {"x": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# --- DNSMOS pipeline ------------------------------------------------------------


def _write_tiny_dnsmos_models(tmp_path):
    """Primary: raw [1, 144160] -> 3 raw scores; P.808: mel [1, T, 120] -> 1."""
    w = (np.arange(3, dtype=np.float32).reshape(1, 3) + 1.0) / 10.0
    primary = ox.build_model_bytes(
        [
            ox.encode_node("ReduceMean", ["input_1"], ["m"], axes=[1], keepdims=1),
            ox.encode_node("Abs", ["m"], ["a"]),
            ox.encode_node("Gemm", ["a", "w", "b"], ["out"]),
        ],
        ["input_1"],
        ["out"],
        {"w": w, "b": np.asarray([1.0, 2.0, 3.0], np.float32)},
    )
    p808 = ox.build_model_bytes(
        [
            ox.encode_node("ReduceMean", ["input_1"], ["m"], axes=[1, 2], keepdims=0),
            ox.encode_node("Add", ["m", "c"], ["out"]),
        ],
        ["input_1"],
        ["out"],
        {"c": np.asarray([3.0], np.float32)},
    )
    pp = tmp_path / "sig_bak_ovr.onnx"
    p8 = tmp_path / "model_v8.onnx"
    pp.write_bytes(primary)
    p8.write_bytes(p808)
    return str(pp), str(p8)


def test_dnsmos_pipeline_end_to_end(tmp_path):
    from tts_max_tpu.training.rlhf import dnsmos

    pp, p8 = _write_tiny_dnsmos_models(tmp_path)
    fn = dnsmos.load_dnsmos(pp, p8, personalized=True)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(5 * 16000) * 0.1).astype(np.float32)
    scores = fn.score(wav, 16000)
    assert set(scores) == {"p808", "sig", "bak", "ovr"}
    # __call__ returns mos_ovr like the reference (reward_utils.py:137)
    assert fn(wav, 16000) == pytest.approx(scores["ovr"])
    # resampled input goes through the same path
    wav24 = (rng.standard_normal(5 * 24000) * 0.1).astype(np.float32)
    assert np.isfinite(fn(wav24, 24000))


def test_dnsmos_segmentation_averages_hops(tmp_path):
    from tts_max_tpu.training.rlhf import dnsmos

    pp, p8 = _write_tiny_dnsmos_models(tmp_path)
    fn = dnsmos.load_dnsmos(pp, p8)
    rng = np.random.default_rng(1)
    # 12 s -> floor(12 - 9.01) + 1 = 3 hops; constant signal -> all equal
    wav = np.full(12 * 16000, 0.05, np.float32) + (
        rng.standard_normal(12 * 16000) * 1e-4
    ).astype(np.float32)
    s_long = fn.score(wav, 16000)
    s_seg = fn.score(wav[: dnsmos.SEGMENT_SAMPLES], 16000)
    assert s_long["ovr"] == pytest.approx(s_seg["ovr"], abs=0.05)


def test_dnsmos_env_dir_and_reward_wiring(tmp_path, monkeypatch):
    from tts_max_tpu.training.rlhf import dnsmos

    _write_tiny_dnsmos_models(tmp_path)
    monkeypatch.setenv("DNSMOS_ONNX_DIR", str(tmp_path))
    fn = dnsmos.load_dnsmos()
    wav = np.zeros(16000, np.float32)
    wav[::100] = 0.1
    mos = fn(wav, 16000)
    assert np.isfinite(mos)


def test_audio_melspec_shape_and_scale():
    from tts_max_tpu.training.rlhf import dnsmos

    wav = np.sin(2 * np.pi * 440 * np.arange(144000) / 16000).astype(np.float32)
    feats = dnsmos.audio_melspec(wav)
    # center=True pads n_fft//2=160 each side; odd n_fft=321 ->
    # 1 + (144000 + 320 - 321) // 160 = 900 frames (librosa convention)
    assert feats.shape == (900, 120)
    # power_to_db(ref=max): db <= 0, top_db=80 -> scaled to [-1, 1]
    assert feats.max() == pytest.approx(1.0)
    assert feats.min() >= -1.0 - 1e-6
