"""CI-style packaging smoke test.

1. Build the wheel offline (--no-deps --no-build-isolation), install it
   into an isolated --target directory, and run an import + solve from a
   neutral cwd.
2. Lint the conda recipe (required keys present, jinja balanced).
3. Lint the ROS package manifest (XML well-formed, required tags).
4. Check the generated type stub is in sync with the live API.

Usage: PYTHONPATH=/root/repo python scripts/packaging_smoke.py
"""

import os
import re
import subprocess
import sys
import tempfile
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check_pip_install() -> None:
    """Build the wheel, install it to an isolated --target dir, import+solve.

    (A fresh venv is not viable here: the environment's interpreter is itself
    a venv, so a child venv sees neither setuptools nor jax; wheel + --target
    exercises the same packaging path offline.)
    """
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--quiet", "--no-deps",
             "--no-build-isolation", "-w", tmp, REPO],
            check=True,
        )
        wheels = [f for f in os.listdir(tmp) if f.endswith(".whl")]
        assert len(wheels) == 1, wheels
        target = os.path.join(tmp, "site")
        subprocess.run(
            [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
             "--target", target, os.path.join(tmp, wheels[0])],
            check=True,
        )
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np, teaserpp_tpu as tp\n"
            "assert tp.__file__.startswith(%r), tp.__file__\n"
            "rng = np.random.default_rng(0)\n"
            "src = rng.random((3, 40))\n"
            "q, _ = np.linalg.qr(rng.standard_normal((3, 3)))\n"
            "if np.linalg.det(q) < 0: q[:, 0] *= -1\n"
            "dst = q @ src + np.array([[0.1], [0.2], [0.3]])\n"
            "p = tp.RobustRegistrationSolverParams(noise_bound=0.01,"
            " estimate_scaling=False)\n"
            "sol = tp.RobustRegistrationSolver(p).solve(src, dst)\n"
            "err = np.abs(sol.rotation - q).max()\n"
            "assert sol.valid and err < 1e-4, (sol.valid, err)\n"
            "print('pip-installed solve OK')\n"
        ) % target
        # run from a neutral cwd so the repo checkout cannot shadow the wheel;
        # PYTHONPATH points only at the installed target
        env = dict(os.environ)
        env["PYTHONPATH"] = target
        subprocess.run([sys.executable, "-c", code], check=True, cwd=tmp, env=env)
    print("pip install smoke: OK")


def check_conda_recipe() -> None:
    path = os.path.join(REPO, "conda-recipes", "teaserpp-tpu", "meta.yaml")
    with open(path) as f:
        text = f.read()
    assert text.count("{{") == text.count("}}"), "unbalanced jinja braces"
    for key in ("package:", "name:", "version:", "build:", "requirements:",
                "run:", "test:", "about:"):
        assert key in text, f"meta.yaml missing {key}"
    # strip jinja expressions, then every line must be yaml-parsable
    stripped = re.sub(r"\{\{[^}]*\}\}", "X", text)
    stripped = re.sub(r"^\s*\{%.*%\}\s*$", "", stripped, flags=re.M)
    try:
        import yaml

        yaml.safe_load(stripped)
    except ModuleNotFoundError:
        # fallback: structural sanity only (no tabs, consistent indentation)
        assert "\t" not in stripped, "tabs in meta.yaml"
    print("conda recipe lint: OK")


def check_ros_manifest() -> None:
    path = os.path.join(REPO, "ros", "package.xml")
    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == "package", root.tag
    for tag in ("name", "version", "description", "maintainer", "license"):
        assert root.find(tag) is not None, f"package.xml missing <{tag}>"
    assert root.findtext("name") == "teaserpp_tpu"
    print("ros manifest lint: OK")


def check_stub() -> None:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_stub.py"), "--check"],
        check=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    print("type stub: OK")


if __name__ == "__main__":
    check_conda_recipe()
    check_ros_manifest()
    check_stub()
    check_pip_install()
    print("packaging smoke: ALL OK")
