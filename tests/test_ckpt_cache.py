"""Converted-checkpoint cache location: auto-conversion must never write
beside the source ``.pth`` (the source tree may be read-only/external —
round 1 polluted the reference tree this way); conversions are cached under
the repo's ``weights/converted/<method>/`` keyed by source path."""

import os
import shutil
import stat

import pytest

from evreal_tpu.harness import runner

CKPT = "/root/reference/pretrained/FireNet+/model.pth"


@pytest.fixture
def readonly_ckpt_dir(tmp_path):
    src = tmp_path / "external" / "FireNet+"
    src.mkdir(parents=True)
    shutil.copy(CKPT, src / "model.pth")
    src.chmod(stat.S_IRUSR | stat.S_IXUSR)
    yield src
    src.chmod(stat.S_IRWXU)


def test_convert_leaves_source_dir_untouched(readonly_ckpt_dir, tmp_path,
                                             monkeypatch):
    fake_repo = tmp_path / "repo"
    fake_repo.mkdir()
    monkeypatch.setattr(runner, "_repo_root", lambda: str(fake_repo))

    cfg = {"model_name": "FireNet+",
           "model_path": str(readonly_ckpt_dir / "model.pth")}
    params, meta = runner.load_method_params(cfg)
    assert meta["class"] == "FireNet"
    assert params  # non-empty tree

    assert sorted(os.listdir(readonly_ckpt_dir)) == ["model.pth"]
    cache_dir = fake_repo / "weights" / "converted" / "FireNet+"
    cached = list(cache_dir.glob("model-*.npz"))
    assert len(cached) == 1
    assert (cache_dir / (cached[0].name + ".json")).exists()

    # second load must come from the cache, not re-run torch conversion
    def boom(*a, **k):
        raise AssertionError("conversion re-ran despite a valid cache")

    monkeypatch.setattr(runner, "load_method_checkpoint", boom)
    params2, meta2 = runner.load_method_params(cfg)
    assert meta2 == meta


def test_cache_keyed_by_source_path(tmp_path, monkeypatch):
    fake_repo = tmp_path / "repo"
    fake_repo.mkdir()
    monkeypatch.setattr(runner, "_repo_root", lambda: str(fake_repo))

    a = tmp_path / "a" / "model.pth"
    b = tmp_path / "b" / "model.pth"
    for p in (a, b):
        p.parent.mkdir()
        shutil.copy(CKPT, p)

    runner.load_method_params({"model_name": "FireNet+", "model_path": str(a)})
    runner.load_method_params({"model_name": "FireNet+", "model_path": str(b)})
    cached = list((fake_repo / "weights" / "converted" / "FireNet+")
                  .glob("model-*.npz"))
    assert len(cached) == 2  # distinct sources never share a cache entry


def test_sibling_npz_read_path_still_honored(tmp_path, monkeypatch):
    """A pre-existing converted .npz next to the .pth is used directly."""
    fake_repo = tmp_path / "repo"
    fake_repo.mkdir()
    monkeypatch.setattr(runner, "_repo_root", lambda: str(fake_repo))

    d = tmp_path / "c"
    d.mkdir()
    shutil.copy(CKPT, d / "model.pth")
    cfg = {"model_name": "FireNet+", "model_path": str(d / "model.pth")}

    from evreal_tpu.convert import load_method_checkpoint, save_params
    flat, meta = load_method_checkpoint("FireNet+", str(d / "model.pth"))
    save_params(str(d / "model.npz"), flat, meta)

    def boom(*a, **k):
        raise AssertionError("conversion ran despite a sibling .npz")

    monkeypatch.setattr(runner, "load_method_checkpoint", boom)
    params, meta2 = runner.load_method_params(cfg)
    assert meta2 == meta
    assert not (fake_repo / "weights").exists()


def test_cache_key_portable_for_in_repo_sources(monkeypatch, tmp_path):
    """In-repo checkpoints are keyed by repo-relative path, so a shipped
    conversion cache resolves identically from any checkout location."""
    keys = []
    for root in (tmp_path / "checkout_a", tmp_path / "checkout_b"):
        root.mkdir()
        monkeypatch.setattr(runner, "_repo_root", lambda r=root: str(r))
        p = runner._converted_cache_path(
            "FireNet+", str(root / "pretrained" / "FireNet+" / "model.pth"))
        keys.append(os.path.relpath(p, root))
    assert keys[0] == keys[1]
