"""Smoke tests for the driver/example layer (the reference's plt/ and
results/ equivalents) and the results loader against the bundled reference
npz traces."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/gpgradpy/results/data_paper_precon/Rosen_a10_d5"

ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           JAX_ENABLE_X64="1",
           PYTHONPATH="")  # drop the axon sitecustomize for CPU test runs


def _run_example(name, timeout=300):
    p = subprocess.run([sys.executable, os.path.join(REPO, "examples", name)],
                       capture_output=True, text=True, timeout=timeout,
                       cwd=REPO, env=ENV)
    assert p.returncode == 0, f"{name} failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout


@pytest.mark.slow
def test_plt_kern_corr():
    out = _run_example("plt_kern_corr.py")
    assert "saved" in out
    os.remove(os.path.join(REPO, "plt_kern_corr.png"))


@pytest.mark.slow
def test_plt_surr_1d():
    out = _run_example("plt_surr_1d.py")
    assert "local MLL maxima" in out
    os.remove(os.path.join(REPO, "plt_surr_1d.png"))


@pytest.mark.slow
def test_plt_acq():
    out = _run_example("plt_acq.py")
    assert "saved" in out
    os.remove(os.path.join(REPO, "plt_acq.png"))


@pytest.mark.slow
def test_plt_cond():
    out = _run_example("plt_cond.py", timeout=600)
    assert "saved" in out
    os.remove(os.path.join(REPO, "plt_cond.png"))


@pytest.mark.slow
def test_plt_nugget_1d():
    out = _run_example("plt_nugget_1d.py", timeout=600)
    assert "saved" in out
    os.remove(os.path.join(REPO, "plt_nugget_1d.png"))


def test_results_loader_reads_reference_traces():
    """Our PltOptzResults must load the reference's bundled paper npz files
    and reproduce the BASELINE.md summary numbers."""
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data not mounted")
    from gpgradpy_tpu.results import PltOptzResults

    files = ["Baye_Kern_SE_n500_Grad_T_None_all.npz",
             "Baye_Kern_SE_n500_Grad_T_Precon_all.npz"]
    merit, opt, fsb = PltOptzResults.load_npz_data(REF_DATA, files,
                                                   n_iter_max=None)
    med_merit, med_opt = PltOptzResults.summarize(merit, opt)
    # BASELINE.md: baseline best optimality 7.6e-05, precon 6.6e-13 (d=5)
    np.testing.assert_allclose(med_opt[0], 7.6e-05, rtol=0.1)
    np.testing.assert_allclose(med_opt[1], 6.6e-13, rtol=0.1)
    # best merit: baseline 4.7e-11, precon 2.2e-26
    np.testing.assert_allclose(med_merit[0], 4.7e-11, rtol=0.1)
    np.testing.assert_allclose(med_merit[1], 2.2e-26, rtol=0.1)
