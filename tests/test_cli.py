"""CLI surface (`python -m lanpaint_tpu`): arg plumbing + image I/O.

The inpaint command is driven against the tiny single-file pipeline from
test_pipeline (monkeypatched builder — the CLI defaults to full-size
configs, which CI cannot compile) so the test exercises everything except
checkpoint auto-detection: flag parsing, PIL load/save, pixel-space
conventions, and the pipeline call contract.
"""

import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


import lanpaint_tpu.__main__ as cli


def test_info_command(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "devices:" in out and "default config:" in out


def test_image_io_roundtrip(tmp_path):
    from PIL import Image

    rgb = np.random.default_rng(0).integers(0, 256, (16, 16, 3), np.uint8)
    p = tmp_path / "in.png"
    Image.fromarray(rgb).save(p)
    arr = cli._load_image(str(p))
    assert arr.shape == (1, 3, 16, 16)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    q = tmp_path / "out.png"
    cli._save_image(str(q), arr)
    back = np.asarray(Image.open(q))
    np.testing.assert_array_equal(back, rgb)


def test_mask_io_binarizes(tmp_path):
    from PIL import Image

    g = np.zeros((8, 8), np.uint8)
    g[2:6, 2:6] = 200
    g[0, 0] = 100  # below the 50% threshold
    p = tmp_path / "m.png"
    Image.fromarray(g, "L").save(p)
    m = cli._load_mask(str(p))
    assert m.shape == (8, 8)
    assert m[3, 3] == 1.0 and m[0, 0] == 0.0 and m[7, 7] == 0.0


@pytest.fixture()
def tiny_pipeline(tmp_path):
    from lanpaint_tpu.models.textenc import CLIPTextConfig
    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
    from lanpaint_tpu.models.vae import TINY_VAE_CONFIG
    from lanpaint_tpu.pipeline import LanPaintPipeline

    from test_pipeline import _clip_vocab_files, _single_file_state

    cfg = CLIPTextConfig(vocab_size=2 * 256 + 2, width=32, layers=2,
                         heads=2, intermediate=64, projection_dim=0,
                         eos_token_id=2 * 256 + 1)
    vp, mp, _ = _clip_vocab_files(tmp_path)
    state = _single_file_state(cfg)
    return LanPaintPipeline.from_single_file(
        "<in-memory>", state=state, vocab=vp, merges=mp,
        unet_config=TINY_UNET_CONFIG, clip_l_config=cfg,
        vae_config=TINY_VAE_CONFIG, height=32, width=32)


def test_inpaint_command_end_to_end(tmp_path, monkeypatch, tiny_pipeline):
    from PIL import Image

    monkeypatch.setattr(cli, "_build_pipeline", lambda args: tiny_pipeline)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (32, 32, 3), np.uint8)).save(
        tmp_path / "in.png")
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    Image.fromarray(m, "L").save(tmp_path / "mask.png")
    out_path = tmp_path / "out.png"
    rc = cli.main([
        "inpaint", "--checkpoint", "unused", "--vocab", "unused",
        "--merges", "unused", "--image", str(tmp_path / "in.png"),
        "--mask", str(tmp_path / "mask.png"), "--output", str(out_path),
        "--height", "32", "--width", "32", "--steps", "3",
        "--think-steps", "1", "--prompt", "a cat", "--blend-overlap", "3",
    ])
    assert rc == 0
    out = np.asarray(Image.open(out_path))
    assert out.shape == (32, 32, 3)
    # blend preserves pixels far outside the mask (PNG quantization only)
    inp = np.asarray(Image.open(tmp_path / "in.png"))
    np.testing.assert_allclose(out[:2].astype(int), inp[:2].astype(int),
                               atol=1)


def test_family_flag_routes_to_from_components(monkeypatch, tmp_path):
    """--family flux must call from_components with the component flags."""
    from PIL import Image

    from lanpaint_tpu.pipeline import LanPaintPipeline

    seen = {}

    def fake_from_components(cls=None, **kw):
        seen.update(kw)
        raise RuntimeError("stop-after-routing")

    monkeypatch.setattr(LanPaintPipeline, "from_components",
                        classmethod(lambda cls, **kw: fake_from_components(**kw)))
    img = tmp_path / "i.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    with pytest.raises(RuntimeError, match="stop-after-routing"):
        cli.main(["inpaint", "--checkpoint", "model.st", "--family", "flux",
                  "--vae", "ae.st", "--clip-l", "clip.st", "--t5", "t5.st",
                  "--t5-tokenizer", "spiece.model", "--vocab", "v.json",
                  "--merges", "m.txt", "--image", str(img), "--mask",
                  str(img)])
    assert seen["family"] == "flux" and seen["vae"] == "ae.st"
    assert seen["t5"] == "t5.st" and seen["clip_vocab"] == "v.json"


def _write_header_only_ckpt(path, keys):
    """Minimal safetensors file containing `keys` as 1-float tensors —
    enough for the header-only census (which never reads tensor data)."""
    from safetensors.numpy import save_file

    save_file({k: np.zeros((1,), np.float32) for k in keys}, str(path))


def test_info_census_exact_match(tmp_path, capsys):
    """A file whose key set equals the family's import table -> OK, rc 0."""
    from lanpaint_tpu.models.zoo import family_expected_keys

    want = family_expected_keys("sd15")
    p = tmp_path / "sd15.safetensors"
    _write_header_only_ckpt(p, want)
    rc = cli.main(["info", "--census", str(p), "--family", "sd15"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "census: OK" in out
    assert f"expected: {len(want)} keys" in out


def test_info_census_reports_diff(tmp_path, capsys):
    """Missing + leftover keys are named and the exit code is 1 — the
    actionable first-real-checkpoint report for the stand-in families
    (VERDICT r3 task 8)."""
    from lanpaint_tpu.models.zoo import family_expected_keys

    want = sorted(family_expected_keys("sd15"))
    dropped = want[3]
    keys = [k for k in want if k != dropped] + ["bogus.extra.weight"]
    p = tmp_path / "bad.safetensors"
    _write_header_only_ckpt(p, keys)
    rc = cli.main(["info", "--census", str(p), "--family", "sd15"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "census: MISMATCH" in out
    assert dropped in out
    assert "bogus.extra.weight" in out


def test_info_census_fp8_scale_companions_ignored(tmp_path):
    """`.scale_weight` companions are folded into `.weight` by the loader
    (fp8_scaled format) — the census must not count them as leftover."""
    from lanpaint_tpu.models.load import safetensors_header_keys

    p = tmp_path / "fp8.safetensors"
    _write_header_only_ckpt(p, ["a.weight", "a.scale_weight", "b.weight"])
    keys = safetensors_header_keys(str(p))
    assert set(keys) == {"a.weight", "b.weight"}


def test_info_census_unknown_family(tmp_path):
    p = tmp_path / "x.safetensors"
    _write_header_only_ckpt(p, ["k"])
    with pytest.raises(ValueError, match="no key census"):
        cli.main(["info", "--census", str(p), "--family", "nope"])


def test_family_expected_keys_standins_nonempty():
    """Every stand-in family must have a census table (the guard that makes
    the first real checkpoint fail actionably, not with a shape error)."""
    from lanpaint_tpu.models.zoo import family_expected_keys

    for fam in ("flux2-dev", "flux2-klein", "krea2", "anima",
                "qwen", "hidream", "zimage", "wan-14b", "wan-5b",
                "hyvideo", "sdxl", "sd35-large"):
        keys = family_expected_keys(fam)
        assert len(keys) > 50, fam
