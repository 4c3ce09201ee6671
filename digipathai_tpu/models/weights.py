"""Trained-weight fetch/cache/convert pipeline.

Parity target: the reference's per-tissue-family wget cache
(``reference DigiPathAI/helpers/utils.py:58-98``, consumed at
``reference DigiPathAI/Segmentation.py:230-278``), hardened with sha256
verification, atomic writes and retry, and extended with an on-disk converted
cache (msgpack flax variables) so the h5 conversion cost is paid once.

When weights are unavailable (no network / file missing) the engine can fall
back to deterministic random initialization (``allow_random=True``) so the
full pipeline stays runnable and benchable.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional

MODES = {"colon": "digestpath", "liver": "paip", "breast": "camelyon"}
MODEL_KEYS = ("dense", "inception", "deeplabv3")

_RELEASE_BASE = "https://github.com/haranrk/DigiPathAI/releases/download/models"
_H5_NAME = {"dense": "densenet", "inception": "inception", "deeplabv3": "deeplabv3"}

# Pinned sha256 digests of the release .h5 assets, keyed by release filename.
# TODO(network): this build environment has zero egress, so the real digests
# cannot be computed here.  On the first networked machine run
# ``python -m digipathai_tpu.models.weights pin --mode <mode>`` — it
# downloads each asset, records its digest into <cache>/pins.json, and prints
# the literal dict entries to paste below.  A digest that is present but
# wrong makes ``download()`` fail loudly (no silent corruption).
_H5_SHA256: dict = {
    # "digestpath_densenet.h5": "<sha256>",
    # "digestpath_inception.h5": "<sha256>",
    # "digestpath_deeplabv3.h5": "<sha256>",
    # "paip_densenet.h5": "<sha256>",
    # "paip_inception.h5": "<sha256>",
    # "paip_deeplabv3.h5": "<sha256>",
    # "camelyon_densenet.h5": "<sha256>",
    # "camelyon_inception.h5": "<sha256>",
    # "camelyon_deeplabv3.h5": "<sha256>",
}


def pinned_sha256(filename: str):
    """Digest for a release asset: built-in pin, else <cache>/pins.json."""
    if filename in _H5_SHA256:
        return _H5_SHA256[filename]
    import json

    try:
        pins = json.loads((cache_dir() / "pins.json").read_text())
        return pins.get(filename)
    except (OSError, ValueError):
        return None


def cache_dir() -> Path:
    root = os.environ.get("DPAI_CACHE", os.path.join(os.path.expanduser("~"), ".DigiPathAI"))
    return Path(root)


def h5_path(mode: str, model: str) -> Path:
    fam = MODES[mode]
    return cache_dir() / f"{fam}_models" / f"{fam}_{_H5_NAME[model]}.h5"


def h5_url(mode: str, model: str) -> str:
    fam = MODES[mode]
    return f"{_RELEASE_BASE}/{fam}_{_H5_NAME[model]}.h5"


def download(url: str, dst: Path, sha256: Optional[str] = None,
             retries: int = 3, timeout: int = 60) -> Path:
    """Atomic, retried download with optional checksum verification."""
    import requests

    dst.parent.mkdir(parents=True, exist_ok=True)
    tmp = dst.with_suffix(dst.suffix + ".part")
    last_err: Optional[Exception] = None
    for _ in range(retries):
        try:
            with requests.get(url, stream=True, timeout=timeout) as r:
                r.raise_for_status()
                hasher = hashlib.sha256()
                with open(tmp, "wb") as f:
                    for chunk in r.iter_content(1 << 20):
                        f.write(chunk)
                        hasher.update(chunk)
            if sha256 and hasher.hexdigest() != sha256:
                raise IOError(f"checksum mismatch for {url}")
            os.replace(tmp, dst)
            return dst
        except Exception as e:  # noqa: BLE001 - retried, re-raised below
            last_err = e
            if tmp.exists():
                tmp.unlink()
    raise IOError(f"failed to download {url}: {last_err}")


def ensure_h5(mode: str, model: str, status=None) -> Optional[Path]:
    """Return the cached h5 path, downloading if needed; None if unavailable."""
    p = h5_path(mode, model)
    if p.exists():
        return p
    if os.environ.get("DPAI_OFFLINE", "0") == "1":
        return None
    if status is not None:
        status["status"] = "Downloading Trained Models"
    try:
        return download(h5_url(mode, model), p, sha256=pinned_sha256(p.name))
    except IOError:
        return None


def load_variables(bundle, mode: str, model: str, patch_size: int,
                   status=None, allow_random: bool = True, seed: int = 0):
    """Get flax variables for ``bundle``: converted cache > h5 > random."""
    import pickle

    conv_path = cache_dir() / "converted" / f"{MODES[mode]}_{model}.flax.pkl"
    if conv_path.exists():
        with open(conv_path, "rb") as f:
            return pickle.load(f)

    h5 = ensure_h5(mode, model, status=status)
    template = bundle.init(patch_size, seed=seed)
    if h5 is not None:
        from .convert_h5 import coverage_report, keras_h5_to_flax

        # a misaligned checkpoint must fail loudly, not cache half-random
        # weights that look like trained output
        rep = coverage_report(str(h5), template)
        n_ours = len(rep["matched"]) + len(rep["ours_only"])
        if rep["ours_only"]:
            import warnings

            warnings.warn(
                f"{mode}/{model}: {len(rep['ours_only'])}/{n_ours} layers "
                f"not present in the checkpoint (e.g. {rep['ours_only'][:3]})",
                stacklevel=2)
        if n_ours and len(rep["ours_only"]) > 0.05 * n_ours:
            raise IOError(
                f"checkpoint {h5} does not match the {model} architecture: "
                f"{len(rep['ours_only'])}/{n_ours} layers unmatched "
                f"(first: {rep['ours_only'][:5]})")
        variables = keras_h5_to_flax(str(h5), template, strict=False)
        conv_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = conv_path.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(variables, f)
        os.replace(tmp, conv_path)
        return variables

    if not allow_random:
        raise IOError(
            f"weights for {mode}/{model} unavailable and allow_random=False")
    return _random_fallback(template, mode, model, status)


def _random_fallback(template, mode, model, status):
    import warnings

    warnings.warn(
        f"trained weights for {mode}/{model} are unavailable "
        f"(offline or download failed) — falling back to RANDOM "
        f"initialization; segmentation output will be meaningless. "
        f"Pass allow_random_weights=False to fail instead.",
        stacklevel=2)
    if status is not None:
        status["weights"] = "random"
    return template


def main(argv=None) -> int:
    """CLI: prefetch and convert trained weights.

        python -m digipathai_tpu.models.weights prefetch --mode breast
    """
    import argparse

    from .registry import build_model

    ap = argparse.ArgumentParser(prog="digipathai_tpu.models.weights")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pf = sub.add_parser("prefetch", help="download + convert checkpoints")
    pf.add_argument("--mode", choices=sorted(MODES), required=True)
    pf.add_argument("--models", nargs="+", default=list(MODEL_KEYS),
                    choices=list(MODEL_KEYS))
    pf.add_argument("--patch-size", type=int, default=256)
    pin = sub.add_parser(
        "pin", help="download assets, record sha256 pins to <cache>/pins.json")
    pin.add_argument("--mode", choices=sorted(MODES), action="append",
                     dest="modes", help="repeatable; default: all modes")
    args = ap.parse_args(argv)

    if args.cmd == "pin":
        import json

        pins_path = cache_dir() / "pins.json"
        try:
            pins = json.loads(pins_path.read_text())
        except (OSError, ValueError):
            pins = {}
        for mode in args.modes or sorted(MODES):
            for model in MODEL_KEYS:
                p = ensure_h5(mode, model)
                if p is None:
                    print(f"{mode}/{model}: download FAILED")
                    return 1
                digest = hashlib.sha256(p.read_bytes()).hexdigest()
                pins[p.name] = digest
                print(f'    "{p.name}": "{digest}",')
        pins_path.write_text(json.dumps(pins, indent=1, sort_keys=True))
        print(f"pins recorded to {pins_path}; paste the lines above into "
              f"_H5_SHA256 in {__file__}")
        return 0

    ok = True
    for model in args.models:
        try:
            b = build_model(model)
            load_variables(b, args.mode, model, args.patch_size,
                           allow_random=False)
            print(f"{args.mode}/{model}: ready "
                  f"({cache_dir() / 'converted'})")
        except IOError as e:
            ok = False
            print(f"{args.mode}/{model}: FAILED — {e}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
