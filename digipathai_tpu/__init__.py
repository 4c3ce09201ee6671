"""DigiPathAI-TPU: a TPU-native whole-slide-image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DigiPathAI
(reference: /root/reference/DigiPathAI): a whole-slide-image viewer plus a
patch-based cancer-segmentation engine (DenseNet-U-Net / Inception-ResNet-v2
U-Net / DeepLabv3+ ensemble with test-time augmentation, overlap-add
probability stitching, uncertainty maps and dense-CRF refinement), redesigned
for TPU hardware:

- compute path: jit-compiled flax models in bfloat16, vectorized TTA,
  on-device supertile overlap-add stitching, static shapes throughout;
- scale path: ``jax.sharding.Mesh`` data/model parallelism over TPU chips;
- host path: first-party tiled-pyramidal-TIFF reader/writer (pure Python +
  C++/libtiff fast path), double-buffered threaded patch loader;
- serving path: stdlib WSGI server with the same HTTP surface as the
  reference Flask app (Deep Zoom tiles, /segment, /check_segment_status).
"""

__version__ = "0.1.0"

# Lazy re-exports: keep `import digipathai_tpu` cheap (no jax import).
_LAZY = {
    "getSegmentation": "digipathai_tpu.engine.segmentation",
    "Slide": "digipathai_tpu.io.slide",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["getSegmentation", "Slide", "__version__"]
