"""wseg_tpu — TPU-native single-stage weakly-supervised semantic segmentation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
EnchanterXiao/1-stage-wseg ("Single-Stage Semantic Segmentation from Image
Labels", Araslanov & Roth, CVPR 2020, plus the fork's CAM/attention model zoo).

Architecture (TPU-first, not a port):
  * pure-functional compute core: models are Flax modules that return a
    ``ModelOutput`` struct; all loss / pseudo-ground-truth logic lives in a
    functional ``losses``/``ops`` layer (the reference tangles losses into
    ``nn.Module.forward``; reference: models/SoftMaxAE.py:185-261).
  * static shapes everywhere: train crops are fixed, multi-scale inference
    pads each view to a per-bucket static size so XLA compiles one program
    per bucket and the MXU sees large batched convolutions.
  * parallelism via ``jax.sharding.Mesh`` + NamedSharding: the batch is
    sharded over a 1-D ``data`` axis (replacing the reference's
    nn.DataParallel, train.py:112) and gradients all-reduce inside XLA over
    ICI.  Large-image inference can additionally shard H over a ``space``
    axis (XLA inserts halo exchanges for convs automatically).
  * hot memory-bound ops (PAMR mask refinement) have fused Pallas TPU
    kernels next to their lax reference implementations, behind one API.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("WSEG_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pre-registers a
    # platform and ignores JAX_PLATFORMS (e.g. relayed TPU backends):
    # WSEG_PLATFORM=cpu forces the CPU backend for this process.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["WSEG_PLATFORM"])

# Persistent compilation cache: remote-compile TPU relays pay ~1 min for
# the first conv program per process; the cache turns repeat compiles into
# sub-second loads.  Override location with WSEG_JAX_CACHE; disable with
# WSEG_JAX_CACHE=off.
_cache = _os.environ.get("WSEG_JAX_CACHE",
                         _os.path.expanduser("~/.cache/wseg_tpu_jax"))


def _host_cpu_tag() -> str:
    """Short hash of the host's CPU feature flags.

    XLA:CPU AOT cache entries embed the *compiling* machine's feature
    set and fail to load on hosts missing any of them ("machine feature
    +prefer-no-gather is not supported"; every load then falls back to
    a slow recompile).  CPU-platform runs (tests, dryrun_multichip)
    therefore use a per-CPU-signature cache subdirectory; TPU programs
    are compiled for the TPU target and stay in the shared directory.

    The signature must include the CPU *model*, not just the flags
    line: LLVM keys tuning features like +prefer-no-gather/-scatter on
    family/model/stepping (Sapphire vs Emerald Rapids hosts expose
    near-identical cpuinfo flags but different LLVM feature sets), so a
    flags-only hash collides across such hosts and every AOT load still
    fails back into a slow recompile with error spam (seen in the r5
    dryrun logs even with the flags-hash subdir).
    """
    import hashlib
    ident, flags = [], ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping", "CPU implementer",
                           "CPU part", "CPU variant", "CPU revision"):
                    ident.append(line.strip())
                elif key in ("flags", "Features"):
                    flags = " ".join(sorted(line.split()))
                if flags and key == "bugs":
                    break  # first processor block is enough
    except OSError:
        pass
    if ident or flags:
        return hashlib.sha1(
            ("|".join(sorted(set(ident))) + "#" + flags)
            .encode()).hexdigest()[:12]
    import platform
    return platform.machine() or "unknown"


if _cache and _cache != "off":
    if (_os.environ.get("WSEG_PLATFORM") == "cpu"
            or "xla_force_host_platform_device_count"
            in _os.environ.get("XLA_FLAGS", "")):
        _cache = _os.path.join(_cache, "cpu-" + _host_cpu_tag())
    import jax as _jax
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:
        pass

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list  # noqa: F401
