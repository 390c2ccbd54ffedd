"""C API: build the embedding library + a pure-C client, run it, decode
its output with our decoder (vvencinterfacetest.c analog)."""

import os
import pathlib
import subprocess
import sys
import sysconfig

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
BUILD = REPO / "native" / "build"


def _build_capi():
    BUILD.mkdir(parents=True, exist_ok=True)
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    so = BUILD / "libvvenc_tpu_capi.so"
    exe = BUILD / "test_capi"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         f"-I{inc}", f"-I{REPO / 'capi'}",
         str(REPO / "capi" / "vvenc_tpu_capi.cpp"),
         f"-L{libdir}", f"-l{pyver}", "-o", str(so)],
        check=True, capture_output=True)
    subprocess.run(
        ["gcc", "-O2", f"-I{REPO / 'capi'}",
         str(REPO / "capi" / "test_capi.c"),
         str(so), f"-L{libdir}", f"-l{pyver}",
         f"-Wl,-rpath,{BUILD}", f"-Wl,-rpath,{libdir}",
         "-o", str(exe)],
        check=True, capture_output=True)
    return exe


def test_capi_encode_and_decode(tmp_path):
    try:
        exe = _build_capi()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"toolchain unavailable: {e.stderr[:200]}")
    out = tmp_path / "capi.266"
    env = dict(os.environ)
    # the embedded interpreter needs the venv site-packages + the repo
    site = pathlib.Path(sys.executable).resolve()
    import numpy
    site_pkgs = pathlib.Path(numpy.__file__).parents[1]
    env["PYTHONPATH"] = f"{REPO}:{site_pkgs}"
    r = subprocess.run([str(exe), str(out)], env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "capi ok" in r.stdout
    data = out.read_bytes()
    from vvenc_tpu.decoder import decode_stream
    frames = decode_stream(data)
    assert len(frames) == 2
    assert frames[0].planes[0].shape == (64, 64)
