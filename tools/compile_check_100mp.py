"""AOT compile-check the 100 MP-shaped hot programs against HBM.

The expensive failure mode of big-raster work on TPU is a COMPILE-time
HBM OOM found 10+ minutes into an end-to-end run: layout padding turns a
modest logical intermediate into gigabytes (docs/performance.md "128-lane
layout rule"), and the cross-band quantise OOM of 2026-08-19 (two live
2 GB padded scatter copies + the 3.4 GB f32 image argument, 0.77 GB over
15.75 GB HBM) cost a full 100 MP attempt to discover.

This tool lowers and compiles the scene-scale hot programs from
ShapeDtypeStructs alone — no scene build, no upload, no execution — so a
memory cliff surfaces in seconds-to-minutes as a compile error instead.
Run it after touching any 100 MP-path program:

    python tools/compile_check_100mp.py             # 10000x10000 x8
    python tools/compile_check_100mp.py 12000 12000 8

Per program it prints PASS with XLA's memory analysis (temp + argument
bytes) when the backend exposes one, or FAIL with the first line of the
compiler's error. Exit status is the number of failures.

Requires the TPU backend (the padded layouts it guards against are
TPU-specific; the CPU compiler proves nothing). Run it as the ONLY TPU
client — concurrent axon clients serialize.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _fmt_bytes(n) -> str:
    if n is None:
        return "?"
    return f"{n / (1 << 30):.2f} GiB"


def check(name, jitted, *args, **static):
    import jax

    try:
        compiled = jitted.lower(*args, **static).compile()
        mem = None
        try:
            mem = compiled.memory_analysis()
        except Exception:
            pass
        if mem is not None:
            print(f"PASS {name}: temp={_fmt_bytes(getattr(mem, 'temp_size_in_bytes', None))} "
                  f"args={_fmt_bytes(getattr(mem, 'argument_size_in_bytes', None))} "
                  f"out={_fmt_bytes(getattr(mem, 'output_size_in_bytes', None))}")
        else:
            print(f"PASS {name}")
        return True
    except (TypeError, AttributeError):
        # tool-side breakage (signature drift in the checked internals),
        # not a compiler verdict — surface the traceback instead of
        # counting it as a compile failure
        raise
    except Exception as e:
        first = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"FAIL {name}: {first}")
        return False


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("refusing to run on the CPU backend: the layout cliffs this "
              "guards against are TPU-specific", file=sys.stderr)
        sys.exit(2)
    print(f"backend={dev.platform} scene={H}x{W}x{C}")

    from obia_tpu.ops import glcm as G
    from obia_tpu.ops import stats as S

    K_pad = S.pad_num_segments(3000)
    levels = 256
    distance = 2
    angles = (0.0, np.pi / 4, np.pi / 2, 3 * np.pi / 4)
    A = len(angles)

    f32 = jnp.float32
    img = jax.ShapeDtypeStruct((H, W, C), f32)
    lab = jax.ShapeDtypeStruct((H, W), jnp.int32)
    q_all = jax.ShapeDtypeStruct((C, H, W), jnp.uint8)
    vstack = jax.ShapeDtypeStruct((A, H * W), jnp.bool_)
    band_pos = jax.ShapeDtypeStruct((), jnp.int32)

    n_checks = 0

    def counted(name, jitted, *args, **static):
        nonlocal n_checks
        n_checks += 1
        return check(name, jitted, *args, **static)

    failures = 0
    failures += not counted(
        "spectral_moments_stacked", S._segment_spectral_moments_stacked,
        img, lab, num_segments=K_pad)
    failures += not counted(
        "quantize_bands", G._quantize_bands,
        img, lab, num_segments=K_pad, levels=levels,
        band_ids=tuple(range(C)))
    failures += not counted(
        "glcm_valid_stack", G._glcm_valid_stack,
        lab, distance=distance, angles=angles)
    failures += not counted(
        "glcm_from_q", G._glcm_from_q_jit,
        q_all, band_pos, lab, valid_stack=vstack,
        num_segments=K_pad, levels=levels, distance=distance,
        angles=angles, compute_asm=True)

    # config-2 regime: small scene, HUGE K (quickshift ~54k objects at
    # 1024² forces the non-histogram ASM path through the band-fused
    # program) — the 2026-08-19 36.9 GB layout OOM lived here, invisible
    # to every CPU test
    h2, c2 = 1024, 3
    K2 = S.pad_num_segments(54264)
    img2 = jax.ShapeDtypeStruct((h2, h2, c2), f32)
    lab2 = jax.ShapeDtypeStruct((h2, h2), jnp.int32)
    # big K forces the split route (quantize_bands + per-band programs
    # with per-angle scans): the band-fused _glcm_bands program at this
    # K scheduled ~72 feature-minor (1, N) scatter copies concurrently
    # (36.9 GB) — _FUSE_BANDS_MAX_K gates it off. Check what runs.
    failures += not counted(
        "quantize_bands_bigK", G._quantize_bands,
        img2, lab2, num_segments=K2, levels=levels,
        band_ids=tuple(range(c2)))
    q2_all = jax.ShapeDtypeStruct((c2, h2, h2), jnp.uint8)
    vstack2 = jax.ShapeDtypeStruct((A, h2 * h2), jnp.bool_)
    failures += not counted(
        "glcm_from_q_bigK_smallscene", G._glcm_from_q_jit,
        q2_all, band_pos, lab2, valid_stack=vstack2,
        num_segments=K2, levels=levels, distance=distance,
        angles=angles, compute_asm=True)

    # the Pallas MXU GLCM path at the north-star job bucket (the kernel +
    # its padded-raster feeders live on the 100 MP critical path now)
    from obia_tpu.ops import glcm_pallas as GP
    Hp, Wp = GP.padded_shape(H, W)
    side = (2.0 * H * W / 3000) ** 0.5
    J = GP._bucket(int(3000 * (side / GP.TR + 1) * (side / GP.TC + 1)))
    jobs_i32 = jax.ShapeDtypeStruct((J,), jnp.int32)
    jobs_f32 = jax.ShapeDtypeStruct((J,), jnp.float32)
    lab_pad = jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)
    band_pad = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    failures += not counted(
        "glcm_pallas_jobs", GP._glcm_jobs_call,
        jobs_i32, jobs_i32, jobs_f32, jobs_f32, lab_pad, band_pad,
        num_jobs=J, n_angles=A,
        offsets=G.angle_offsets(distance, angles), valid_hw=(H, W),
        levels=levels)
    failures += not counted(
        "glcm_pallas_pad_band", GP.pad_band_f32,
        img, band_pos, Hp=Hp, Wp=Wp)
    failures += not counted(
        "glcm_bbox_minmax", G._bbox_minmax,
        img, lab, num_segments=K_pad, band_ids=tuple(range(C)))

    print(f"{n_checks - failures}/{n_checks} programs compile")
    sys.exit(failures)


if __name__ == "__main__":
    main()
