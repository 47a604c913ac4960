"""download_data.sh logic, exercised offline.

The archive SOURCE is environment-blocked here (zero egress), but
everything around it — fetch dispatch, unzip into data/, overwrite of a
partial earlier run, cleanup of the downloaded zip, and the failure path's
exit code + synthetic-data hint — is plain shell logic that must not wait
for a networked machine to be known-good. INF_DATA_URL_BASE pointed at a
local directory exercises the exact same script body (reference contract:
tum-vision/intrinsic-neural-fields download_data.sh:1-11 — same nine
archive names, same data/ unpack layout; the archive list itself is pinned
by test_default_archive_list).
"""
import os
import subprocess
import zipfile

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "download_data.sh")

REFERENCE_ARCHIVES = [
    "cat_rescaled_rotated", "cat_dataset_v2_tiny", "cat_tri",
    "discretizations", "human", "human_dataset_v2_tiny", "human_tri",
    "shape_descriptors", "texture_transfer",
]


def _make_fixture_zip(path, name, payload):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(f"{name}/mesh.obj", payload)
        z.writestr(f"{name}/cameras.npz", b"not-a-real-npz")


def _run(cwd, src, points):
    return subprocess.run(
        ["bash", SCRIPT],
        cwd=cwd,
        env={**os.environ, "INF_DATA_URL_BASE": str(src),
             "INF_DATA_POINTS": points},
        capture_output=True,
        text=True,
    )


def test_fetch_unpack_layout_and_cleanup(tmp_path):
    src = tmp_path / "webshare"
    src.mkdir()
    for nm in ("alpha", "beta"):
        _make_fixture_zip(src / f"{nm}.zip", nm, f"o {nm}\n")
    work = tmp_path / "work"
    work.mkdir()

    res = _run(work, src, "alpha beta")
    assert res.returncode == 0, res.stderr
    # unpacked into the reference's data/<archive-root>/ layout
    assert (work / "data/alpha/mesh.obj").read_text() == "o alpha\n"
    assert (work / "data/beta/cameras.npz").exists()
    # downloaded zips are cleaned up
    assert not list((work / "data").glob("*.zip"))


def test_overwrites_stale_earlier_run(tmp_path):
    src = tmp_path / "webshare"
    src.mkdir()
    _make_fixture_zip(src / "alpha.zip", "alpha", "o fresh\n")
    work = tmp_path / "work"
    (work / "data/alpha").mkdir(parents=True)
    (work / "data/alpha/mesh.obj").write_text("o stale\n")

    res = _run(work, src, "alpha")
    assert res.returncode == 0, res.stderr
    # unzip -o replaces the stale file (the reference's plain unzip would
    # prompt and hang in a non-interactive rerun)
    assert (work / "data/alpha/mesh.obj").read_text() == "o fresh\n"


def test_missing_archive_fails_with_synthetic_hint(tmp_path):
    src = tmp_path / "webshare"
    src.mkdir()
    _make_fixture_zip(src / "alpha.zip", "alpha", "o alpha\n")
    work = tmp_path / "work"
    work.mkdir()

    res = _run(work, src, "alpha missing_archive")
    assert res.returncode == 1
    assert "FAILED to fetch missing_archive.zip" in res.stderr
    # the present archives still landed
    assert (work / "data/alpha/mesh.obj").exists()
    # and the zero-egress fallback is advertised
    assert "run_synthetic_end_to_end.sh" in res.stderr


def test_default_archive_list():
    """The default archive list is the reference's nine, verbatim."""
    body = open(SCRIPT).read()
    for nm in REFERENCE_ARCHIVES:
        assert f'"{nm}"' in body, nm
    # and the default source is the TUM webshare
    assert "vision.in.tum.de/webshare/g/intrinsic-neural-fields" in body
