"""Recipe shell-script health: every egs/ script parses, gates PYTHONPATH
on the axon-tunnel harness, and dry-runs its stage arithmetic.

The reference launches recipes via torchrun with a `speakerlab` symlink in
each recipe dir (reference: egs/3dspeaker/sv-eres2netv2/run.sh); our
scripts must work both on plain hosts (PYTHONPATH export) and on the
tunneled-TPU harness where PYTHONPATH breaks axon PJRT plugin registration
(CLAUDE.md) — there they import the package through a cwd symlink instead.
"""

import glob
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_SCRIPTS = sorted(
    glob.glob(os.path.join(REPO, "egs", "**", "*.sh"), recursive=True)
)
RUN_SCRIPTS = [p for p in ALL_SCRIPTS if os.path.basename(p).startswith("run")]


def _rel(p):
    return os.path.relpath(p, REPO)


@pytest.mark.parametrize("script", ALL_SCRIPTS, ids=_rel)
def test_bash_syntax(script):
    subprocess.run(["bash", "-n", script], check=True)


@pytest.mark.parametrize("script", ALL_SCRIPTS, ids=_rel)
def test_pythonpath_is_axon_gated(script):
    """No script may export PYTHONPATH unconditionally: on the axon TPU
    harness that breaks PJRT plugin registration (CLAUDE.md)."""
    src = open(script).read()
    if "PYTHONPATH" in src:
        assert "PALLAS_AXON_POOL_IPS" in src, (
            f"{_rel(script)} sets PYTHONPATH without the axon-harness gate"
        )


@pytest.mark.parametrize("script", RUN_SCRIPTS, ids=_rel)
def test_stage_dry_run(script, tmp_path):
    """Run each recipe entry point with stage window (99, 0) so no stage
    body executes; the pre-stage preamble (cd, env defaults, path
    absolutization, gating) must succeed under set -euo pipefail."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # plain-host branch; no symlinks
    env.update(STAGE="99", STOP_STAGE="0")
    proc = subprocess.run(
        ["bash", script],
        env=env,
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, (
        f"{_rel(script)} dry-run failed:\n{proc.stdout}\n{proc.stderr}"
    )


@pytest.mark.parametrize("script", RUN_SCRIPTS, ids=_rel)
def test_stage_dry_run_axon_branch(script, tmp_path):
    """Same dry run with PALLAS_AXON_POOL_IPS set: the axon branch must
    create the package symlink instead of exporting PYTHONPATH."""
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="dryrun", STAGE="99", STOP_STAGE="0")
    proc = subprocess.run(
        ["bash", script],
        env=env,
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, (
        f"{_rel(script)} axon-branch dry-run failed:\n{proc.stdout}\n{proc.stderr}"
    )
    # scripts cd to their own dir; if they took the symlink branch, the
    # link must resolve to the real package
    d = os.path.dirname(script)
    link = os.path.join(d, "speaker3d_tpu")
    if os.path.islink(link):
        assert os.path.samefile(link, os.path.join(REPO, "speaker3d_tpu"))
