"""Fused whole-HANCBlock Pallas kernel in the s2d frame layout.

This is the SURVEY §7.2 "fused Pallas kernels for HANC" milestone applied at
block granularity: the entire inference body of a HANCBlock
(ACC_UNet/ACC_UNet.py:224-286 — conv1x1 expand -> BN -> lrelu -> depthwise
3x3 -> BN -> lrelu -> HANC aggregation+mix -> BN -> lrelu -> residual -> BN
-> conv1x1 project -> BN -> lrelu) runs in one Pallas kernel over the
space-to-depth frame (ops/s2d.py), with all BatchNorms folded to per-channel
affines.  Only the trailing SE (a global reduce + two tiny matmuls +
elementwise scale) stays in XLA, fused into the consumer.

Why: on v5e the unfused frame path materializes the E-channel interior
(E = inv_fctr * n_filts, e.g. 192 logical = 768 frame channels at 112^2 for
the cnv91 decoder block) in HBM seven times; measured 4.3 ms/block against a
~0.4 ms bytes+VPU bound.  In-kernel the interior lives only in VMEM: HBM
traffic is read-x + write-y.

Layout strategy (the part that makes Mosaic happy):
  * the frame input stays position-MAJOR in HBM ((..., 4*Cin), lanes
    aligned); position blocks are sliced per row-tile in VMEM where the
    arrays are small,
  * the wide interior is kept as FOUR SEPARATE (rows, W, E) arrays — one per
    sub-position — so no 1.5-vreg lane-offset slicing ever happens on the
    hot tensors (the failure mode that sank the round-1 full-res kernels),
  * the depthwise conv's cross-position taps become whole-array spatially
    shifted multiply-adds (static slices of a once-padded buffer),
  * HANC's logical 2x2 pool == a position-block mean/max (pure VPU), the
    logical 4x4 pool == a 2x2 spatial pool of that, and the upsample-adds
    telescope coarsest-first exactly as in ops/pallas/hanc.py.

Grid: (B, Hf/th).  Each tile recomputes the 1x1 expand on th+2 rows (halo
for the depthwise conv); the input is row-padded once in HBM so halo rows
are in-range, and a row mask zeroes the convolution pad rows after the
expand (SAME-padding semantics pad the *post-activation* map).

Training falls back to the unfused frame path (BN needs batch statistics
mid-block); the backward pass never sees this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

# (pos_out, tap_u, tap_v) -> (pos_in, row_shift, col_shift), all in {-1,0,1}
from accunet_tpu.ops.s2d import _S2D_GEOM


def _kernel(xa_ref, xb_ref, w1_ref, wd_ref, wh0_ref, whp_ref, w3_ref,
            affe_ref, affn_ref, affc_ref, *out_refs, cin, e, nf, cout, k, th,
            hf, gb=1, debug_phase="full", emit_sums=False):
    """One (gb images x th rows x full width) frame tile -> four finished
    position blocks of the HANCBlock output (pre-SE).

    `gb` images are processed per program (unrolled loop): at small E the
    per-row-tile work is tiny and the kernel is program-count-bound (E=96:
    112 programs at b8/th=8 measured SLOWER than unfused XLA), so batching
    images multiplies per-program work without touching the Mosaic-fragile
    tile geometry."""
    hi = pl.program_id(1)
    for im in range(gb):
        # rows [hi*th, hi*th+th+2) of the row-padded frame == logical frame
        # rows hi*th-1 .. hi*th+th.  Staged as two th-row blocks of the SAME
        # padded array (xa = tile rows, xb = next tile, of which only the
        # first 2 halo rows are read) so VMEM holds 2*th rows instead of the
        # whole image — whole-image staging blew the 16M scoped-vmem limit
        # inside the full model (24.03M at the cnv91 shapes).
        xt = jnp.concatenate([xa_ref[im], xb_ref[im][:2]], axis=0)
        xq = [xt[:, :, p * cin:(p + 1) * cin] for p in range(4)]
        _kernel_one(
            xq, w1_ref, wd_ref, wh0_ref, whp_ref, w3_ref,
            affe_ref, affn_ref, affc_ref, out_refs, im=im, hi=hi, cin=cin,
            e=e, nf=nf, cout=cout, k=k, th=th, hf=hf, debug_phase=debug_phase,
            emit_sums=emit_sums,
        )


def _kernel_parts(p0c, p0t, p0b, p1c, p1t, p1b, p2c, p2t, p2b, p3c, p3t, p3b,
                  pre_ref, w1_ref, wd_ref, wh0_ref, whp_ref, w3_ref,
                  affe_ref, affn_ref, affc_ref, *out_refs, cin, e, nf, cout,
                  k, th, hf, gb=1, debug_phase="full", emit_sums=False):
    """Chained-input variant (ROOFLINE §13.2/§13.4): the block input arrives
    as the previous fused block's FOUR raw position-block outputs (pre-SE)
    plus the SE gate*scale / shift vectors; the SE apply (lrelu(x*gs + tb))
    runs on the staged rows in VMEM, so the whole concat+SE XLA boundary
    pass between chained blocks disappears.  Halo rows are staged as two
    1-row blocks with clamped index maps (the clamped duplicate rows are
    zeroed by the SAME-padding masks post-expand, exactly like the legacy
    path's zero-pad rows)."""
    hi = pl.program_id(1)
    srcs = [(p0t, p0c, p0b), (p1t, p1c, p1b), (p2t, p2c, p2b),
            (p3t, p3c, p3b)]
    dt = p0c.dtype
    for im in range(gb):
        gs = pre_ref[im, 0].astype(dt)
        tb = pre_ref[im, 1].astype(dt)
        xq = []
        for t_, c_, b_ in srcs:
            q = jnp.concatenate([t_[im], c_[im], b_[im]], axis=0)
            q = q * gs + tb
            xq.append(jnp.maximum(q, q * jnp.asarray(0.01, dt)))
        _kernel_one(
            xq, w1_ref, wd_ref, wh0_ref, whp_ref, w3_ref,
            affe_ref, affn_ref, affc_ref, out_refs, im=im, hi=hi, cin=cin,
            e=e, nf=nf, cout=cout, k=k, th=th, hf=hf, debug_phase=debug_phase,
            emit_sums=emit_sums,
        )


def _kernel_one(xq, w1_ref, wd_ref, wh0_ref, whp_ref, w3_ref,
                affe_ref, affn_ref, affc_ref, out_refs, *, im, hi, cin, e,
                nf, cout, k, th, hf, debug_phase, emit_sums=False):
    # xq: four (th+2, wf, cin) per-position source arrays (tile rows + halo)
    wf = xq[0].shape[1]
    w1 = w1_ref[:]           # (cin, e)   BN scale pre-folded (host side)
    wd = wd_ref[:]           # (9, e)     BN scale pre-folded
    affe = affe_ref[:]       # (2, e)   t1, t2 (shift only — scales folded)
    affn = affn_ref[:]       # (3, nf)  th_, sres, tres
    affc = affc_ref[:]       # (1, cout)  t3

    f32 = jnp.float32
    dt = xq[0].dtype

    def lrelu(t):
        # max(t, 0.01*t) == leaky_relu(t, 0.01); Mosaic lowers maximum on
        # packed bf16 but not cmpf/select
        return jnp.maximum(t, t * jnp.asarray(0.01, t.dtype))

    # SAME-padding row masks: of the th+2 staged rows only the two halo rows
    # can fall outside the image (row 0 iff hi==0, row th+1 iff hi==last), so
    # the mask is two SCALAR multiplies on single rows instead of a full
    # (th+2, wf, e) interior pass (ROOFLINE §12: the kernel is VPU-bound —
    # every saved per-element op is wall-clock)
    mtop = (hi > 0).astype(dt)
    mbot = (hi < hf // th - 1).astype(dt)

    # ---- 1x1 expand (BN scale folded into w1) + shift + lrelu, on th+2
    # rows (halo recompute) ----
    t1 = affe[0].astype(dt)
    qp = []  # per-position (th+2, wf+2, e), col-padded for the dwconv
    for p in range(4):
        xpos = xq[p]
        y = lax.dot_general(
            xpos.reshape(-1, cin), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt).reshape(th + 2, wf, e)
        y = lrelu(y + t1)
        # SAME padding pads the post-activation map with zeros
        y = jnp.concatenate(
            [y[:1] * mtop, y[1:th + 1], y[th + 1:] * mbot], axis=0
        )
        qp.append(jnp.pad(y, ((0, 0), (1, 1), (0, 0))))

    if debug_phase == "expand":
        for p in range(4):
            out_refs[p][im] = qp[p][1:1 + th, 1:1 + wf, :cout]
        return

    # ---- depthwise 3x3 (BN scale folded into the taps) + shift + lrelu ----
    t2 = affe[1].astype(dt)
    d = []  # per-position (th, wf, e)
    for po in range(4):
        acc = None
        for po2, u, v, pi, gi, gj in _S2D_GEOM:
            if po2 != po:
                continue
            src = qp[pi][1 + gi:1 + gi + th, 1 + gj:1 + gj + wf, :]
            term = src * wd[3 * (u + 1) + (v + 1)].astype(dt)
            acc = term if acc is None else acc + term
        d.append(lrelu(acc + t2))

    if debug_phase == "dwconv":
        for p in range(4):
            out_refs[p][im] = d[p][:, :, :cout]
        return

    # ---- HANC: pyramid + paired branch mixes, telescoped coarsest-first.
    # Each branch's avg/max pair is ONE matmul via sum-form stacking —
    # concat([avg, max], lanes) @ vstack(w_avg, w_max) == avg@w_avg +
    # max@w_max — halving the branch matmul launches at no VMEM cost.
    # (Row-concatenating the 4 position mixes into one matmul was tried and
    # reverted: the concat copies the whole E-wide interior.) ----
    def mixw(t, w):
        rows, ww = t.shape[0], t.shape[1]
        out = lax.dot_general(
            t.reshape(rows * ww, -1), w, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return out.reshape(rows, ww, nf)  # fp32

    def pool2(t, kind):
        h, ww, cc = t.shape
        r = t.reshape(h // 2, 2, ww // 2, 2, cc)
        q = [r[:, 0, :, 0], r[:, 0, :, 1], r[:, 1, :, 0], r[:, 1, :, 1]]
        if kind == "max":
            return jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
        return ((q[0] + q[1]) + (q[2] + q[3])) * jnp.asarray(0.25, t.dtype)

    def up2(t):
        h, ww, cc = t.shape
        r = jnp.broadcast_to(t[:, None, :, None, :], (h, 2, ww, 2, cc))
        return r.reshape(2 * h, 2 * ww, cc)

    acc = None
    if k >= 2:
        # logical 2x2 pool == position-block reduce (frame-resolution map)
        quarter = jnp.asarray(0.25, dt)
        a1 = ((d[0] + d[1]) + (d[2] + d[3])) * quarter
        m1 = jnp.maximum(jnp.maximum(d[0], d[1]), jnp.maximum(d[2], d[3]))
        avg_maps, max_maps = [a1], [m1]
        for _ in range(3, k + 1):  # logical 2^i pool == frame 2^(i-1) pool
            avg_maps.append(pool2(avg_maps[-1], "avg"))
            max_maps.append(pool2(max_maps[-1], "max"))
        for i in range(k - 1, 0, -1):
            if e % 128 == 0:
                # lane-aligned E: the pair concat is vreg-clean
                pair = jnp.concatenate(
                    [avg_maps[i - 1], max_maps[i - 1]], axis=-1
                )
                term = mixw(pair, whp_ref[i - 1])
            else:
                # misaligned E (e.g. 192): a lane-offset concat is the known
                # Mosaic failure mode — mix the halves separately
                w2 = whp_ref[i - 1]
                term = mixw(avg_maps[i - 1], w2[:e]) + mixw(max_maps[i - 1], w2[e:])
            acc = term if acc is None else term + up2(acc)

    th_ = affn[0]                        # fp32: hanc runs in fp32 accum
    sres, tres = affn[1].astype(dt), affn[2].astype(dt)
    t3 = affc[0].astype(dt)
    w3 = w3_ref[:]                       # (nf, cout)  BN scale pre-folded

    for p in range(4):
        h = mixw(d[p], wh0_ref[:])       # hanc BN scale folded into wh
        if acc is not None:
            h = h + acc
        r = lrelu(h + th_).astype(dt)                  # hanc BN shift + lrelu
        xv = xq[p][1:1 + th]                           # residual (nf == cin)
        z = (r + xv) * sres + tres                     # 'norm' BN (no lrelu)
        t = lax.dot_general(
            z.reshape(-1, nf), w3, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dt).reshape(th, wf, cout)
        o = lrelu(t + t3)
        out_refs[p][im] = o
        if emit_sums:
            # per-tile channel sums of the output, for the trailing SE's
            # global mean — the consumer then never re-reads the full map
            # from HBM (same pattern as ops/pallas/respath.py)
            out_refs[4][im, 0, p] = o.astype(f32).sum(axis=(0, 1))


def _vmem_estimate(th, wf, e, nf, cin, k, gb=1, chained=False):
    interior = 4 * (th + 2) * (wf + 2) * e * 2          # qp
    interior += 4 * th * wf * e * 2                     # d
    interior += int(2.7 * th * wf * e * 2)              # pyramid maps
    io = 4 * th * wf * 4 * cin * 2 + 4 * 2 * th * wf * nf * 2
    if chained:
        # _kernel_parts (advisor r4): the chained-input variant additionally
        # stages four per-position (th+2)-row source arrays built by
        # concatenating the 3 halo blocks, plus the SE apply (q*gs+tb) and
        # lrelu temporaries on those rows — all four positions are live
        # before _kernel_one starts. Counted at 3x the staged size (concat
        # result + affine temp + max temp), per image.
        io += 3 * 4 * (th + 2) * wf * cin * 2
    weights = (cin * e + 9 * e + (2 * k - 1) * e * nf + nf * nf) * 2
    fp32 = 3 * th * wf * nf * 4
    # io (input/output blocks hold all gb images) scales with gb; the
    # unrolled per-image interiors are conservatively counted live too
    return (interior + fp32) * gb + io * gb + weights


def pick_tile(hf: int, k: int, wf: int | None = None, e: int | None = None,
              nf: int | None = None, cin: int | None = None,
              chained: bool = False) -> int | None:
    """Row-tile: multiple of 2^(max(k,2)-2) frame rows (pool alignment), a
    divisor of Hf, small enough to keep the wide interior in VMEM.  When the
    shape is given, tiles whose working set would blow the ~16M scoped-vmem
    limit are rejected (matters for the canonical cnv72, E=4352)."""
    s = max(2 ** (k - 2), 1) if k >= 2 else 1

    def fits(th):
        if wf is None or e is None:
            return True
        nf_ = nf or e
        cin_ = cin or nf_
        # The estimate carries the same measured 2x Mosaic-stack calibration
        # as pick_gb: at the small-E geometries the model undercounts the
        # actual scoped allocation by ~2x (measured: cnv12@112f gb=2 est
        # 8.5M vs 17.04M actual, ROOFLINE §10; cnv12@256f-frame (512^2
        # input) th=8 est 8.9M vs 20.00M actual — the driver-bench OOM that
        # forced this margin). The huge-interior cnv72 point (th=2 est
        # 14.6M compiles) shows the margin is conservative there — the
        # fused path then falls back to unfused XLA for that opt-in s2d=3
        # geometry, which measured FASTER anyway (3.98 fused vs 2.66 ms
        # unfused, ROOFLINE §6).
        return 2 * _vmem_estimate(th, wf, e, nf_, cin_, k,
                                  chained=chained) < 16 * 2**20

    for th in (8, 4, 2):
        if th % s == 0 and hf % th == 0 and fits(th):
            return th
    return None


def pick_gb(b: int, th: int, wf: int, e: int, nf: int, cin: int, k: int,
            chained: bool = False) -> int:
    """Images per program: the largest divisor of b whose conservative VMEM
    estimate fits.  At small E the kernel is program-count-bound (ROOFLINE
    §6: E=96 at b8/th=8 = 112 tiny programs measured slower than unfused
    XLA), so batching images per program is the lever that scales per-program
    work without touching the Mosaic-fragile tile geometry.

    The gb>1 budget carries a measured 2x factor: in the 2026-08-18 window
    (ROOFLINE §10) the level-1 geometry (th=8, wf=112, e=128, nf=cin=32)
    estimated 8.5M at gb=2 but Mosaic's actual scoped-stack allocation was
    17.04M — the model misses lane-padding of sub-128 channel buffers and
    the double-buffered io blocks, both of which bite hardest exactly where
    gb wants to engage (small-E tiles). pick_tile now carries the same 2x
    margin (added after the 512^2 driver-bench OOM), so gb=1 no longer uses
    the original cnv72-calibrated budget: cnv72's th=2 tile fails the
    margin and intentionally falls back to the unfused path, which measured
    FASTER there anyway (3.98 fused vs 2.66 ms unfused, ROOFLINE §6)."""
    for gb in (8, 4, 2):
        if b % gb == 0 and 2 * _vmem_estimate(
                th, wf, e, nf, cin, k, gb, chained=chained) < 16 * 2**20:
            return gb
    return 1


def hanc_block_frame(xf, w1, b1, wd, bd, wh, bh, w3, b3, bns, k, *,
                     interpret=False, th=None, gb=None, pad_e=True,
                     debug_phase="full", emit_sums=False,
                     x_parts=None, pre=None, emit_parts=False):
    """Fused HANCBlock forward (pre-SE) on a frame map.

    xf: (B, Hf, Wf, 4*cin) s2d frame.  w1 (cin, e), wd (3, 3, e),
    wh (e, 2k-1, nf), w3 (nf, cout), b* the conv biases.  bns: dict of four
    folded BN affines {'norm1','norm2','hnc','norm','norm3'} -> (scale,
    shift) pairs (fp32, per logical channel); conv biases are folded into
    the following BN's shift here.  Returns the (B, Hf, Wf, 4*cout) frame —
    or, with ``emit_sums``, a (frame, sums) pair where sums is
    (B, Hf/th, 4, cout) fp32 per-tile/per-position channel sums of the
    output so the trailing SE's global mean never re-reads the map.

    Chaining (ROOFLINE §13.2/§13.4): ``x_parts`` (4 x (B, Hf, Wf, cin), the
    previous fused block's raw position outputs) + ``pre`` ((B, 2, cin)
    fp32: [gate*se_scale, se_shift] rows) replace ``xf`` — the previous
    block's SE apply runs on this kernel's staged rows in VMEM.
    ``emit_parts`` returns (parts, sums) instead of the concatenated frame
    so the NEXT chained block can consume the raw outputs (requires
    emit_sums).
    """
    assert not (emit_sums and debug_phase != "full")
    assert not (emit_parts and not emit_sums)
    assert (x_parts is None) == (pre is None)
    if x_parts is not None:
        b, hf, wf, cin = x_parts[0].shape
        c4 = 4 * cin
    else:
        b, hf, wf, c4 = xf.shape
        cin = c4 // 4
    e = w1.shape[1]
    nf = w3.shape[0]
    cout = w3.shape[1]
    chained = x_parts is not None
    if th is None:
        th = pick_tile(hf, k, wf, e, nf, cin, chained=chained)
    assert th is not None and hf % th == 0
    if gb is None:
        import os

        # "auto" = pick_gb; an integer requests that batch factor but is
        # clamped to the largest safe divisor <= the request — a forced gb
        # that Mosaic cannot allocate (measured OOMs in the 2026-08-18
        # window, ROOFLINE §10) helps nobody
        env = os.environ.get("ACCUNET_FUSED_HANC_GB", "1")
        if env == "auto":
            gb = pick_gb(b, th, wf, e, nf, cin, k, chained=chained)
        else:
            req = int(env)
            gb = 1
            for cand in (8, 4, 2):
                if cand <= req and b % cand == 0 and \
                        2 * _vmem_estimate(th, wf, e, nf, cin, k, cand,
                                           chained=chained) < 16 * 2**20:
                    gb = cand
                    break
            if req > 1 and gb != req:
                # a forced gb silently clamped (VMEM estimate or batch
                # divisibility) would make A/B configs lie about what ran —
                # say so once per distinct downgrade (advisor r3)
                import warnings

                warnings.warn(
                    f"ACCUNET_FUSED_HANC_GB={req} downgraded to gb={gb} at "
                    f"(b={b}, th={th}, wf={wf}, e={e}): VMEM estimate or "
                    "batch divisibility rejected the requested factor",
                    stacklevel=2,
                )
        if b % gb:
            gb = 1
    assert b % gb == 0

    def fold(pair, bias):
        s, t = pair
        if bias is not None:
            t = t + bias.astype(t.dtype) * s
        return s.astype(jnp.float32), t.astype(jnp.float32)

    s1, t1 = fold(bns["norm1"], b1)
    s2, t2 = fold(bns["norm2"], bd)
    sh_, th_ = fold(bns["hnc"], bh)
    sres, tres = fold(bns["norm"], None)
    s3, t3 = fold(bns["norm3"], b3)

    # BN scales are folded into the conv weights (fp32, before the bf16
    # cast): x@(w*s) == (x@w)*s, and the depthwise taps scale per-channel.
    # The kernel is VPU-bound (ROOFLINE §12) — each fold deletes one full
    # pass over the E-wide interior; only the shifts remain in-kernel.
    affe = jnp.stack([t1, t2])                    # (2, e) fp32
    affn = jnp.stack([th_, sres, tres])           # (3, nf) fp32
    affc = t3[None]                               # (1, cout) fp32

    dt = xf.dtype if x_parts is None else x_parts[0].dtype
    w1k = (w1 * s1[None, :]).astype(dt)
    wdk = (wd.reshape(9, e) * s2[None, :]).astype(dt)
    whk = (jnp.transpose(wh, (1, 0, 2)) * sh_[None, None, :]).astype(dt)
    w3k = (w3 * s3[None, :]).astype(dt)
    if pad_e and e % 128:
        # Zero-pad the interior width to the 128-lane vreg grid: every VPU
        # pass over the E-wide interior then runs on aligned registers.
        # Exact — padded w1 columns / affine scale+shift are zero, so junk
        # lanes are identically 0 through lrelu/dwconv (depthwise: junk
        # stays in junk lanes) and the zero wh rows keep them out of the
        # HANC mix.
        ep = -(-e // 128) * 128
        w1k = jnp.pad(w1k, ((0, 0), (0, ep - e)))
        wdk = jnp.pad(wdk, ((0, 0), (0, ep - e)))
        whk = jnp.pad(whk, ((0, 0), (0, ep - e), (0, 0)))
        affe = jnp.pad(affe, ((0, 0), (0, ep - e)))
        e = ep

    # Sum-form paired branch weights: vstack(w_avg_i, w_max_i) so each
    # branch's avg+max mix is one matmul (see _kernel).  k==1 passes a tiny
    # dummy the kernel never reads (static `if k >= 2`).
    wh0k = whk[0]
    if k >= 2:
        whpk = jnp.stack(
            [jnp.concatenate([whk[i], whk[k - 1 + i]], axis=0)
             for i in range(1, k)]
        )  # (k-1, 2e, nf)
    else:
        whpk = jnp.zeros((1, 2, nf), dt)

    out_specs = [
        pl.BlockSpec((gb, th, wf, cout), lambda bi, hi: (bi, hi, 0, 0))
        for _ in range(4)
    ]
    out_shape = [jax.ShapeDtypeStruct((b, hf, wf, cout), dt) for _ in range(4)]
    if emit_sums:
        out_specs.append(
            pl.BlockSpec((gb, 1, 4, cout), lambda bi, hi: (bi, hi, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, hf // th, 4, cout), jnp.float32)
        )

    grid = (b // gb, hf // th)
    weight_specs = [
        pl.BlockSpec((cin, e), lambda bi, hi: (0, 0)),
        pl.BlockSpec((9, e), lambda bi, hi: (0, 0)),
        pl.BlockSpec(wh0k.shape, lambda bi, hi: (0, 0)),
        pl.BlockSpec(whpk.shape, lambda bi, hi: (0, 0, 0)),
        pl.BlockSpec((nf, cout), lambda bi, hi: (0, 0)),
        pl.BlockSpec((2, e), lambda bi, hi: (0, 0)),
        pl.BlockSpec((3, nf), lambda bi, hi: (0, 0)),
        pl.BlockSpec((1, cout), lambda bi, hi: (0, 0)),
    ]
    weights = (w1k, wdk, wh0k, whpk, w3k, affe, affn, affc)
    if x_parts is not None:
        # per position: the th tile rows + two 1-row halo blocks with
        # CLAMPED index maps (row -1 / row Hf read rows 0 / Hf-1; the
        # duplicate data is zeroed by the post-expand SAME-padding masks)
        part_specs, part_args = [], []
        for p in range(4):
            part_specs += [
                pl.BlockSpec((gb, th, wf, cin), lambda bi, hi: (bi, hi, 0, 0)),
                pl.BlockSpec(
                    (gb, 1, wf, cin),
                    lambda bi, hi: (bi, jnp.maximum(hi * th - 1, 0), 0, 0),
                ),
                pl.BlockSpec(
                    (gb, 1, wf, cin),
                    lambda bi, hi: (bi, jnp.minimum(hi * th + th, hf - 1), 0, 0),
                ),
            ]
            part_args += [x_parts[p]] * 3
        pre_arr = pre.astype(jnp.float32)
        outs = pl.pallas_call(
            functools.partial(_kernel_parts, cin=cin, e=e, nf=nf, cout=cout,
                              k=k, th=th, hf=hf, gb=gb,
                              debug_phase=debug_phase, emit_sums=emit_sums),
            grid=grid,
            in_specs=part_specs
            + [pl.BlockSpec((gb, 2, cin), lambda bi, hi: (bi, 0, 0))]
            + weight_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*part_args, pre_arr, *weights)
    else:
        xpad = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
        outs = pl.pallas_call(
            functools.partial(_kernel, cin=cin, e=e, nf=nf, cout=cout, k=k,
                              th=th, hf=hf, gb=gb, debug_phase=debug_phase,
                              emit_sums=emit_sums),
            grid=grid,
            in_specs=[
                # row-padded input, staged twice: the tile's th rows and the
                # next block (first 2 rows = bottom halo; the hi+1 == Hf/th
                # block runs past the array end — Pallas pads, and only its
                # in-range first two rows are read)
                pl.BlockSpec((gb, th, wf, 4 * cin), lambda bi, hi: (bi, hi, 0, 0)),
                pl.BlockSpec((gb, th, wf, 4 * cin), lambda bi, hi: (bi, hi + 1, 0, 0)),
            ] + weight_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(xpad, xpad, *weights)
    if emit_parts:
        return tuple(outs[:4]), outs[4]
    frame = jnp.concatenate(outs[:4], axis=-1)
    if emit_sums:
        return frame, outs[4]
    return frame
