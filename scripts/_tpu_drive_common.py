"""Shared bootstrap for the ad-hoc TPU drive scripts: watchdog,
workdir, repo-relative sys.path."""
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def setup(workdir, cap_s, tag):
    def watchdog():
        time.sleep(cap_s)
        print(f"{tag} WATCHDOG: {cap_s}s cap hit", flush=True)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))


def run_eval(pred_file, dataroot):
    """Score predictions with the standalone evaluator; raise on failure."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"),
         "--file", pred_file, "--dataroot", dataroot],
        capture_output=True, text=True,
    )
    print(r.stdout, r.stderr, flush=True)
    if r.returncode != 0:
        raise SystemExit(f"eval.py failed rc={r.returncode}")
