"""End-to-end pipeline orchestrator (the reference's AerialMVS, in-process).

Capability parity with /root/reference/run.py:39-306, with stage handoff in
memory + the same file artifacts for interoperability:

  workspace/
    sparse/               COLMAP model (input)
    export/               predef cams/images, image_path, viewpair, blocks
    dense/MVS/            <name>_init.pfm, _prob.pfm, <name>.txt
    dense/fusion/         scene_i.ply (+ scene_i.txt border)
    mesh/                 scene_i_mesh.ply
    dsm/                  dsm.tif + dsm.tfw
    production/           copied final products

No subprocess boundaries: every stage is a method call; the MVS stage runs
a single jit-compiled model over all ref views.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional

import numpy as np

from ..dsm import DSMConfig, DSMFromMesh, DSMFromPointCloud
from ..fusion import DepthFusion, FusionConfig, ViewGeometry
from ..fusion.fuse import ViewData
from ..io import text_formats as tf
from ..io.geotiff import write_geotiff, write_tfw
from ..io.pfm import read_pfm, write_pfm
from ..io.ply import read_ply, write_ply
from ..sparse import view_selection
from ..sparse.export import export_predef
from .config import PipelineConfig
from .dataset import EvalDataset


def _join(*parts):
    return os.path.join(*parts)


class AerialPipeline:
    def __init__(self, workspace: str, config: PipelineConfig,
                 data_folder: Optional[str] = None):
        self.ws = workspace
        self.cfg = config
        self.data_folder = data_folder

        self.sparse_path = _join(workspace, "sparse")
        self.export_path = _join(workspace, "export")
        self.dense_path = _join(workspace, "dense")
        self.mvs_path = _join(self.dense_path, "MVS")
        self.fusion_path = _join(self.dense_path, "fusion")
        self.mesh_path = _join(workspace, "mesh")
        self.dsm_path = _join(workspace, "dsm")
        self.production_path = _join(workspace, "production")
        for p in (self.export_path, self.dense_path, self.mvs_path,
                  self.fusion_path, self.mesh_path, self.dsm_path,
                  self.production_path):
            os.makedirs(p, exist_ok=True)

    def _ensure_image_paths(self) -> None:
        """Build export/image_path.txt from the data folder when absent,
        matching COLMAP image names to files (reference --data_folder flow,
        run.py:287-294)."""
        out = _join(self.export_path, "image_path.txt")
        if os.path.exists(out) or self.data_folder is None:
            return
        from ..sparse import colmap

        _, images, _ = colmap.read_model(self.sparse_path)
        entries = []
        for im in sorted(images.values(), key=lambda v: v.id):
            path = _join(self.data_folder, im.name)
            if not os.path.exists(path):
                base = os.path.splitext(im.name)[0]
                for ext in (self.cfg.fext, ".png", ".jpg", ".jpeg", ".tif"):
                    cand = _join(self.data_folder, base + ext)
                    if os.path.exists(cand):
                        path = cand
                        break
            entries.append((im.id, im.name, os.path.abspath(path)))
        tf.write_image_paths(out, entries)

    # ---------------- stage 1: view selection -------------------------
    def select_view(self) -> None:
        cfg = self.cfg
        self._ensure_image_paths()
        export_predef(self.sparse_path, self.export_path)

        from ..sparse import colmap

        _, _, points = colmap.read_model(self.sparse_path)
        xyz = np.stack([p.xyz for p in points.values()]) if points else np.zeros((0, 3))
        blocks, border = view_selection.compute_scene_blocks(
            xyz,
            block_size=cfg.scene_block_size[1:3]
            if len(cfg.scene_block_size) == 3 else cfg.scene_block_size,
            overlap=cfg.block_overlap,
            bbx_border=cfg.bbx_border_scene,
        )
        block_refs, viewpairs = view_selection.select_views(
            self.sparse_path, blocks, mode=cfg.view_selection_mode,
            database_path=_join(self.ws, "database.db"),
        )
        tf.write_view_pairs(_join(self.export_path, "viewpair.txt"), viewpairs)
        tf.write_blocks(_join(self.export_path, "blocks.txt"), block_refs)
        tf.write_border(_join(self.export_path, "scene_border.txt"), border)

    # ---------------- stage 2: dense matching -------------------------
    def dense_match(self, params=None, view_filter=None,
                    on_view_done=None, view_order=None) -> None:
        """Infer + write depth maps. `view_filter`: optional set of ref image
        ids to process (multi-host ownership — parallel/multihost plans).
        `on_view_done(ref_id)`: called after a view's artifacts are fully
        written (multi-host per-view publish markers, enabling fusion of a
        block the moment its views land instead of a global barrier).
        `view_order`: optional ref-id ordering (block-priority order so
        early blocks become fusable while inference continues)."""
        cfg = self.cfg
        import jax
        import jax.numpy as jnp

        from ..models import build_model
        from ..ops.warp import set_high_precision_warp

        set_high_precision_warp(cfg.warp_precision == "compensated")

        ds = EvalDataset(
            self.export_path,
            view_num=cfg.view_num,
            num_depth=cfg.num_depth,
            resize_scale=cfg.image_scale,
            max_h=cfg.max_h, max_w=cfg.max_w,
        )
        if view_filter is not None:
            ds.samples = [s for s in ds.samples if s[0] in view_filter]
        if view_order is not None:
            rank = {v: i for i, v in enumerate(view_order)}
            ds.samples.sort(key=lambda s: rank.get(s[0], 1 << 30))
        if len(ds) == 0:
            return

        kwargs = {"num_depth": cfg.num_depth}
        if cfg.ndepths:
            kwargs["ndepths"] = tuple(int(x) for x in cfg.ndepths)
        if getattr(cfg, "depth_ratios", None):
            kwargs["depth_interval_ratios"] = tuple(
                float(x) for x in cfg.depth_ratios)
        # compute-path config (docs/PERF.md): fused kernels by default,
        # with in-graph fallbacks off-TPU / on unsupported shapes
        kwargs["warp_impl"] = getattr(cfg, "warp_impl", "pallas")
        kwargs["dtype"] = jnp.dtype(
            {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
                getattr(cfg, "compute_dtype", "float32")])
        if cfg.model_type in ("adamvs", "msrednet"):
            kwargs["red_impl"] = getattr(cfg, "red_impl", "pallas")
        # full-res frames: the in-graph XLA gather fallback of the kernel
        # coverage cond cannot even COMPILE (its lane-padded buffers
        # exceed HBM — docs/PERF.md full-res notes), so large frames run
        # strict (no fallback, NaN poison on coverage miss; NaNs are
        # zeroed below = the reference's invalid-depth convention)
        import os as _os

        from ..models.feature_net import FEATS_LOOP_THRESHOLD

        strict_cfg = getattr(cfg, "strict_coverage", None)
        est_px = (cfg.max_h or 0) * (cfg.max_w or 0)
        strict = bool(strict_cfg) or (strict_cfg is None
                                      and est_px >= FEATS_LOOP_THRESHOLD)
        _os.environ["SWEEP_STRICT"] = "1" if strict else "0"
        sample0 = ds.build(0)
        if kwargs["warp_impl"] == "pallas" and "SWEEP_WIN" not in _os.environ:
            # Size the sweep kernel's src windows for THIS survey's
            # geometry: the (32, 256) default covers the bench scenes but
            # not high-focal / wide-baseline production surveys (the r5
            # full-res E2E hit a total coverage miss -> all-NaN maps).
            # Estimated from the first samples' rel projections + depth
            # ranges (host data, ladder-quantized for compile-cache
            # stability), max over a small probe set.
            from ..ops.pallas_sweep import estimate_window

            wh, ww, nr = 32, 256, 4
            for i in range(min(4, len(ds))):
                s_i = sample0 if i == 0 else ds.build(i)
                e_h, e_w, e_nr = estimate_window(
                    s_i.rel_projs, float(s_i.depth_min),
                    float(s_i.depth_max),
                    tuple(np.asarray(s_i.imgs).shape[1:3]),
                    ndepths=tuple(kwargs.get("ndepths", (48, 32, 8))),
                    num_depth=cfg.num_depth,
                )
                wh, ww, nr = max(wh, e_h), max(ww, e_w), max(nr, e_nr)
            _os.environ["SWEEP_WIN"] = f"{wh},{ww}"
            _os.environ["SWEEP_NR"] = str(nr)
            print(f"[mvs] sweep window sized for survey geometry: "
                  f"WIN=({wh},{ww}) NR={nr}")
        model = build_model(cfg.model_type, **kwargs)
        if params is None:
            params = self._load_params(model, sample0)

        B_static = max(1, int(getattr(cfg, "infer_batch_size", 1)))

        @jax.jit
        def infer(p, imgs, rel, dmin, dmax):
            def one(im, rp, a, b):
                out = model.apply(p, im, rp, a, b)
                return out["depth"], out["photometric_confidence"]

            if kwargs["warp_impl"] == "pallas":
                # UNROLLED batch, not vmap: under vmap the pallas sweep
                # kernel's lax.cond coverage fallback lowers to executing
                # BOTH branches (docs/PERF.md "vmap is a trap here")
                outs = [one(imgs[i], rel[i], dmin[i], dmax[i])
                        for i in range(B_static)]
                return (jnp.stack([o[0] for o in outs]),
                        jnp.stack([o[1] for o in outs]))
            return jax.vmap(one)(imgs, rel, dmin, dmax)

        @jax.jit
        def normal_maps(depths_b, K_invs):
            from ..ops.normals import normals_from_depth

            return jax.vmap(normals_from_depth)(depths_b, K_invs)

        B = max(1, int(getattr(cfg, "infer_batch_size", 1)))
        from concurrent.futures import ThreadPoolExecutor

        loader = ThreadPoolExecutor(max_workers=2)
        futures = {
            i: loader.submit(ds.build, i) for i in range(min(2 * B, len(ds)))
        }

        def get_sample(i):
            if i not in futures:
                futures[i] = loader.submit(ds.build, i)
            s = futures.pop(i).result()
            nxt = max(futures.keys(), default=i) + 1
            if nxt < len(ds):
                futures[nxt] = loader.submit(ds.build, nxt)
            return s

        for start in range(0, len(ds), B):
            idxs = list(range(start, min(start + B, len(ds))))
            samples = [get_sample(i) for i in idxs]
            # pad the last batch to keep the compiled shape
            while len(samples) < B:
                samples.append(samples[-1])
            t0 = time.time()
            depth, conf = infer(
                params,
                jnp.asarray(np.stack([s.imgs for s in samples])),
                jnp.asarray(np.stack([s.rel_projs for s in samples])),
                jnp.asarray([s.depth_min for s in samples], jnp.float32),
                jnp.asarray([s.depth_max for s in samples], jnp.float32),
            )
            depth = np.asarray(depth, np.float32)
            conf = np.asarray(conf, np.float32)
            if not np.isfinite(depth).all():
                # strict-coverage NaN poison (or numeric blowup): zero the
                # bad pixels — depth 0 = invalid in the reference contract
                # (fusion masks depth <= 0) — and say so
                bad = ~np.isfinite(depth)
                print(f"[mvs] WARNING: {int(bad.sum())} non-finite depth "
                      f"px in batch {idxs} (coverage miss?); zeroed")
                depth = np.where(bad, 0.0, depth)
                conf = np.where(bad | ~np.isfinite(conf), 0.0, conf)
            normals = None
            if cfg.save_normals:
                # normals from predicted depth (camera frame), stored in
                # [0, 1] per the reference contract (fusion reads *2 - 1,
                # fusion_3d_normal.py:191-195)
                K_invs = np.stack([
                    np.linalg.inv(s.ref_cam.K).astype(np.float32)
                    for s in samples
                ])
                normals = np.asarray(
                    normal_maps(jnp.asarray(depth), jnp.asarray(K_invs)),
                    np.float32,
                )
            for k, i in enumerate(idxs):
                s = samples[k]
                write_pfm(_join(self.mvs_path, f"{s.ref_name}_init.pfm"), depth[k])
                write_pfm(_join(self.mvs_path, f"{s.ref_name}_prob.pfm"), conf[k])
                if normals is not None:
                    write_pfm(
                        _join(self.mvs_path, f"{s.ref_name}_normal.pfm"),
                        (normals[k] + 1.0) * 0.5,
                    )
                tf.write_mvs_cam(_join(self.mvs_path, f"{s.ref_name}.txt"),
                                 s.ref_cam)
                if getattr(cfg, "save_dmap", False):
                    # optional OpenMVS raw container for DensifyPointCloud
                    # interop (reference IO/dmap_io.py:173)
                    from ..io.dmap import DepthDataRaw, write_dmap

                    cam = s.ref_cam
                    R = cam.T_cw[:3, :3]
                    C = -R.T @ cam.T_cw[:3, 3]
                    write_dmap(
                        _join(self.mvs_path, f"{s.ref_name}.dmap"),
                        DepthDataRaw(
                            image_file_name=s.ref_image_path,
                            neighbor_ids=list(s.src_ids),
                            image_size=(cam.height, cam.width),
                            K=cam.K, R=R, C=C,
                            d_min=float(s.depth_min),
                            d_max=float(s.depth_max),
                            depth=depth[k],
                            normal=(normals[k] if normals is not None
                                    else None),
                            confidence=conf[k],
                        ),
                    )
                if cfg.display_depth:
                    self._save_depth_preview(s.ref_name, depth[k], conf[k])
                if on_view_done is not None:
                    on_view_done(s.ref_id)
            print(f"[mvs] {[s.ref_name for s in samples[:len(idxs)]]}: "
                  f"{time.time() - t0:.2f}s")
        loader.shutdown()

    def _save_depth_preview(self, name: str, depth: np.ndarray,
                            conf: np.ndarray) -> None:
        """Color previews of depth + confidence (reference display block,
        predict.py:143-176)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        color_dir = _join(self.mvs_path, "color")
        os.makedirs(color_dir, exist_ok=True)
        d = depth.copy()
        d[~np.isfinite(d)] = np.nanmin(d[np.isfinite(d)]) if np.isfinite(d).any() else 0
        plt.imsave(_join(color_dir, f"{name}_init.png"), -d, cmap="viridis")
        plt.imsave(_join(color_dir, f"{name}_prob.png"),
                   np.nan_to_num(conf).clip(0, 1), cmap="magma")

    def _load_params(self, model, sample):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        if cfg.pretrain_weight and os.path.exists(cfg.pretrain_weight):
            from ..train.checkpoint import restore_params

            return restore_params(cfg.pretrain_weight)
        if not cfg.allow_random_weights:
            raise FileNotFoundError(
                f"pretrain_weight {cfg.pretrain_weight!r} not found. Dense "
                "matching from random weights produces garbage depth; set "
                "DENSEMATCH.allow_random_weights: true only for explicit "
                "capability/shape testing."
            )
        # random init (explicit capability-testing mode)
        return jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(sample.imgs),
            jnp.asarray(sample.rel_projs),
            jnp.float32(sample.depth_min), jnp.float32(sample.depth_max),
        )

    # ---------------- stage 3: fusion ---------------------------------
    def fusion_session(self) -> "FusionSession":
        """Create a fusion session: lazy per-view artifact loading + the
        in-memory consumption mask persisting across fuse_block calls
        (redesign of the reference's tmp/ cross-view mutation,
        fusion_3d_normal.py:417-511). Lets multi-host drivers fuse blocks
        one at a time — the moment each block's views land — without
        losing cross-block dedup within the host."""
        return FusionSession(self)

    def fuse_depth_map(self, block_indices: Optional[List[int]] = None) -> List[str]:
        session = self.fusion_session()
        results = []
        for bi in range(len(session.blocks)):
            if block_indices is not None and bi not in block_indices:
                continue
            out = session.fuse_block_index(bi)
            if out:
                results.append(out)
        return results

    @staticmethod
    def _write_mvs_scene(path, views: Dict[str, ViewData], fused) -> None:
        """Emit the OpenMVS Interface handoff next to the fused PLY
        (reference fusion_3d_normal.py:574-581)."""
        from types import SimpleNamespace

        from ..io.mvs_interface import scene_from_fusion, write_mvs

        ordered = sorted(views.values(), key=lambda v: v.image_id)
        cam_records = []
        images = []
        id_to_index = {}
        for idx, v in enumerate(ordered):
            H, W = v.depth.shape
            cam_records.append(SimpleNamespace(K=v.geom.K, width=W, height=H))
            R_cw = np.asarray(v.geom.T_cw, np.float64)[:3, :3]
            center = np.asarray(v.geom.T_wc, np.float64)[:3, 3]
            images.append((v.image_id, idx, v.name, R_cw, center))
            id_to_index[v.image_id] = idx

        scene = scene_from_fusion(
            cam_records, images, fused.xyz, fused.visibility,
            normals=fused.normals, colors=fused.colors,
            image_id_to_index=id_to_index,
        )
        # each image has its own (possibly cropped) intrinsics -> one platform
        # per view is the safe general layout; see scene_from_fusion
        write_mvs(path, scene)

    # ---------------- stage 4: mesh -----------------------------------
    def create_mesh(self) -> List[str]:
        """ReconstructMesh + RefineMesh equivalents per fused block
        (reference run_mesh pipeline, createmesh.py:145-172)."""
        from ..mesh import MeshConfig, create_mesh_from_scene
        from ..mesh.refine import RefineConfig, refine_mesh_file

        cfg = self.cfg
        mesh_cfg = photo_cfg = None
        atlas_kwargs = {}
        if cfg.mesh_config:
            # OpenMVS-style mesh YAML (reference mesh/config.yaml keys)
            from ..mesh.openmvs_config import load_openmvs_mesh_config

            mesh_cfg, _refine_cfg, photo_cfg, tex = \
                load_openmvs_mesh_config(cfg.mesh_config)
            if tex.get("ignored"):
                print(f"[mesh] config keys without an in-process equivalent "
                      f"(ignored): {', '.join(tex['ignored'])}")
            for key in ("empty_color", "outlier_threshold", "seam_level",
                        "global_seam_level", "size_multiple",
                        "packing_heuristic", "data_smoothness_ratio"):
                if key in tex:
                    atlas_kwargs[key] = tex[key]
        out = []
        for fname in sorted(os.listdir(self.fusion_path)):
            if not fname.endswith(".ply"):
                continue
            src = _join(self.fusion_path, fname)
            from ..io.ply import read_ply as _read_ply

            n_pts = _read_ply(src)[0].shape[0]
            if n_pts < 4:
                # an (all but) empty fused block cannot seed a Delaunay
                # surface; meshing it would emit degenerate artifacts
                # (found by the r5 full-res E2E when a coverage miss
                # zeroed every depth map upstream)
                print(f"[mesh] WARNING: skipping {fname}: only {n_pts} "
                      f"fused points")
                continue
            dst = _join(self.mesh_path, fname.replace(".ply", "_mesh.ply"))
            # prefer the visibility-driven graph-cut core when the block's
            # .mvs scene exists (OpenMVS ReconstructMesh equivalent)
            mvs_path = _join(self.fusion_path, fname.replace(".ply", ".mvs"))
            create_mesh_from_scene(
                src, dst,
                mesh_cfg if mesh_cfg is not None else MeshConfig(
                    insert_distance=cfg.recons_insert_distance,
                    decimate_ratio=cfg.recons_decimate_ratio,
                ),
                mvs_path=mvs_path,
                method=cfg.mesh_method,
            )
            if cfg.refine_scale_times > 0:
                refined = _join(
                    self.mesh_path, fname.replace(".ply", "_mesh_refine.ply")
                )
                refine_mesh_file(dst, refined, RefineConfig(
                    iterations=10 * int(cfg.refine_scale_times),
                    decimate_ratio=cfg.refine_decimate_ratio,
                ))
                dst = refined
            views = self._texture_views()
            if cfg.refine_photometric and views:
                from ..mesh.refine import (PhotoRefineConfig,
                                           photometric_refine)
                from ..mesh.trimesh_io import read_mesh_ply, write_mesh_ply

                verts, faces = read_mesh_ply(dst)
                verts = photometric_refine(
                    verts, faces,
                    [(v.image, v.geom.K, v.geom.T_cw) for v in views],
                    photo_cfg if photo_cfg is not None else PhotoRefineConfig(
                        scales=max(1, int(cfg.refine_scale_times))),
                )
                photo = _join(
                    self.mesh_path,
                    fname.replace(".ply", "_mesh_refine_photo.ply"))
                write_mesh_ply(photo, verts, faces)
                dst = photo
            if views:
                textured = _join(
                    self.mesh_path,
                    fname.replace(".ply", "_mesh_refine_texture.ply"),
                )
                if cfg.texture_atlas:
                    # full TextureMesh parity: UV chart atlas + PNG
                    from ..mesh.atlas import texture_atlas_mesh_file

                    texture_atlas_mesh_file(dst, textured, views,
                                            **atlas_kwargs)
                else:
                    from ..mesh.texture import texture_mesh_file

                    texture_mesh_file(dst, textured, views)
                dst = textured
            out.append(dst)
            print(f"[mesh] {dst}")
        return out

    def _texture_views(self):
        """TextureViews from the MVS per-view cam artifacts + source images."""
        from PIL import Image

        from ..mesh.texture import TextureView

        views = []
        for fname in sorted(os.listdir(self.mvs_path)):
            if not fname.endswith(".txt"):
                continue
            cam = tf.read_mvs_cam(_join(self.mvs_path, fname))
            if not (cam.image_path and os.path.exists(cam.image_path)):
                continue
            img = Image.open(cam.image_path).convert("RGB")
            if img.size != (cam.width, cam.height):
                img = img.resize((cam.width, cam.height))
            views.append(TextureView(
                geom=ViewGeometry.create(cam.K, cam.T_cw),
                image=np.asarray(img),
            ))
        return views

    # ---------------- stage 5: DSM ------------------------------------
    def create_dsm(self) -> Optional[str]:
        cfg = self.cfg
        border_path = _join(self.export_path, "scene_border.txt")
        if cfg.bbx_border_dsm is not None:
            bbx = list(cfg.bbx_border_dsm)
        elif os.path.exists(border_path):
            bbx = list(tf.read_border(border_path))
        else:
            return None

        dcfg = DSMConfig(
            cell_size=tuple(cfg.dsm_uint),
            select_method=cfg.pc_select_method,
            interp_method=cfg.pc_interpolation_method,
        )

        if cfg.dsm_source == "mesh":
            from ..mesh.trimesh_io import read_mesh_ply

            grids = []
            for fname in sorted(os.listdir(self.mesh_path)):
                if fname.endswith(".ply"):
                    v, f = read_mesh_ply(_join(self.mesh_path, fname))
                    grids.append(DSMFromMesh(dcfg).create(v, f, bbx))
            if not grids:
                return None
            grid = np.full_like(grids[0], dcfg.nodata)
            for g in grids:
                grid = np.where(g != dcfg.nodata, np.maximum(grid, g), grid)
        else:
            pts = []
            for fname in sorted(os.listdir(self.fusion_path)):
                if fname.endswith(".ply"):
                    p, _, _ = read_ply(_join(self.fusion_path, fname))
                    pts.append(p)
            if not pts:
                return None
            allp = np.concatenate(pts)
            if allp.shape[0] == 0:
                print("[dsm] WARNING: no fused points; skipping DSM")
                return None
            grid = DSMFromPointCloud(dcfg).create(allp, bbx)

        out_tif = _join(self.dsm_path, "dsm.tif")
        write_geotiff(out_tif, grid, origin_xy=(bbx[0], bbx[3]),
                      cell_size=dcfg.cell_size, nodata=dcfg.nodata)
        write_tfw(_join(self.dsm_path, "dsm.tfw"), (bbx[0], bbx[3]),
                  dcfg.cell_size)
        print(f"[dsm] {out_tif} {grid.shape}")
        return out_tif

    # ---------------- production --------------------------------------
    def move_production(self) -> None:
        mapping = {
            self.fusion_path: _join(self.production_path, "Point_Cloud"),
            self.mesh_path: _join(self.production_path, "Mesh"),
            self.dsm_path: _join(self.production_path, "DSM"),
        }
        for src, dst in mapping.items():
            os.makedirs(dst, exist_ok=True)
            for fname in os.listdir(src):
                if fname.endswith((".ply", ".tif", ".tfw")):
                    shutil.copy2(_join(src, fname), _join(dst, fname))

    # ---------------- pipelined run (PP over scene blocks) -------------
    def run_dense_pipelined(self, params=None) -> None:
        """Block-pipelined execution: the device streams per-view depth maps
        while a host worker fuses + meshes each scene block as soon as all
        of its views are on disk — the pipeline-parallel axis of SURVEY
        §2.10 (the reference runs stages strictly sequentially,
        run.py:263-279). Fusion consumption order across blocks is preserved
        by the single worker processing blocks in index order.
        """
        import threading

        if self.cfg.run_view_selection:
            self.select_view()

        blocks = tf.read_blocks(_join(self.export_path, "blocks.txt"))
        pairs = tf.read_view_pairs(_join(self.export_path, "viewpair.txt"))
        _, names = tf.read_image_paths(_join(self.export_path, "image_path.txt"))
        name_of = {i: os.path.splitext(n)[0] for i, n in names.items()}
        pair_of = {r: [s for s, _ in p][: self.cfg.fusion_num] for r, p in pairs}

        def block_view_names(bi):
            bbx, refs = blocks[bi]
            need = set()
            for r in refs:
                if r in name_of:
                    need.add(name_of[r])
                    need.update(name_of[s] for s in pair_of.get(r, [])
                                if s in name_of)
            return need

        def block_ready(bi):
            return all(
                os.path.exists(_join(self.mvs_path, f"{n}_init.pfm"))
                and os.path.exists(_join(self.mvs_path, f"{n}.txt"))
                for n in block_view_names(bi)
            )

        stop = threading.Event()
        errors = []

        def host_worker():
            try:
                next_block = 0
                while next_block < len(blocks):
                    if block_ready(next_block):
                        if self.cfg.run_depth_fusion:
                            self.fuse_depth_map(block_indices=[next_block])
                        next_block += 1
                    elif stop.is_set():
                        # device finished; anything not ready never will be
                        if block_ready(next_block):
                            continue
                        next_block += 1
                    else:
                        stop.wait(0.25)
                if self.cfg.run_create_mesh:
                    self.create_mesh()
            except Exception as e:  # surface worker failures to the caller
                errors.append(e)

        worker = threading.Thread(target=host_worker)
        worker.start()
        try:
            if self.cfg.run_mvs:
                self.dense_match(params=params)
        finally:
            stop.set()
            worker.join()
        if errors:
            raise errors[0]
        if self.cfg.run_create_dsm:
            self.create_dsm()
        self.move_production()

    # ---------------- full run ----------------------------------------
    def run_dense(self, params=None) -> None:
        cfg = self.cfg
        stages = [
            (cfg.run_view_selection, "view selection", self.select_view),
            (cfg.run_mvs, "dense matching",
             lambda: self.dense_match(params=params)),
            (cfg.run_depth_fusion, "depth fusion", self.fuse_depth_map),
            (cfg.run_create_mesh, "mesh", self.create_mesh),
            (cfg.run_create_dsm, "dsm", self.create_dsm),
        ]
        for enabled, label, fn in stages:
            if not enabled:
                continue
            t0 = time.time()
            fn()
            print(f"[pipeline] {label}: {(time.time() - t0) / 60.0:.2f} min")
        self.move_production()


class FusionSession:
    """Stateful fusion over scene blocks with lazy view loading.

    Views are read from disk on FIRST use (so a multi-host fusion worker
    can start on a block as soon as its views are published, while other
    views are still being inferred elsewhere), and the loaded ViewData
    dict is shared across fuse_block calls — the consumption-mask dedup
    therefore persists across blocks exactly as in the one-shot
    fuse_depth_map (reference semantics: the tmp/ cross-view depth
    invalidation, fusion_3d_normal.py:417-511)."""

    def __init__(self, pipe: AerialPipeline):
        cfg = pipe.cfg
        self.pipe = pipe
        self.fusion = DepthFusion(FusionConfig(
            fusion_num=cfg.fusion_num,
            min_geo_consist=cfg.geo_consist_num,
            photometric_threshold=cfg.photomatric_threshold,
            position_threshold=cfg.position_threshold,
            depth_threshold=cfg.depth_threshold,
            normal_threshold_deg=cfg.normal_threshold,
            pc_format=cfg.pc_format,
        ))
        _, names = tf.read_image_paths(
            _join(pipe.export_path, "image_path.txt"))
        pairs = tf.read_view_pairs(_join(pipe.export_path, "viewpair.txt"))
        self.blocks = tf.read_blocks(_join(pipe.export_path, "blocks.txt"))
        self.name_of = {i: os.path.splitext(n)[0] for i, n in names.items()}
        self.pair_of = {ref: [s for s, _ in plist] for ref, plist in pairs}
        self.views: Dict[str, ViewData] = {}
        self._missing: set = set()

    def _get_view(self, name: str) -> Optional[ViewData]:
        if name in self.views:
            return self.views[name]
        if name in self._missing:
            return None
        pipe = self.pipe
        dpath = _join(pipe.mvs_path, f"{name}_init.pfm")
        cpath = _join(pipe.mvs_path, f"{name}.txt")
        if not (os.path.exists(dpath) and os.path.exists(cpath)):
            self._missing.add(name)
            return None
        cam = tf.read_mvs_cam(cpath)
        depth = read_pfm(dpath)[0]
        ppath = _join(pipe.mvs_path, f"{name}_prob.pfm")
        prob = read_pfm(ppath)[0] if os.path.exists(ppath) else None
        npath = _join(pipe.mvs_path, f"{name}_normal.pfm")
        normal = None
        if os.path.exists(npath):
            normal = read_pfm(npath)[0] * 2.0 - 1.0
        img = None
        if cam.image_path and os.path.exists(cam.image_path):
            from PIL import Image

            im = Image.open(cam.image_path).convert("RGB")
            if im.size != (depth.shape[1], depth.shape[0]):
                im = im.resize((depth.shape[1], depth.shape[0]))
            img = np.asarray(im, np.float32) / 255.0
        self.views[name] = ViewData(
            name=name, image_id=cam.image_id,
            geom=ViewGeometry.create(cam.K, cam.T_cw),
            depth=depth, prob=prob, normal_cam=normal, image=img,
        )
        return self.views[name]

    def fuse_block_index(self, bi: int) -> Optional[str]:
        """Fuse one scene block -> fused PLY path (None if it has no
        available ref views)."""
        pipe = self.pipe
        bbx, refs = self.blocks[bi]
        view_list = []
        for r in refs:
            if r not in self.name_of or r not in self.pair_of:
                continue
            rname = self.name_of[r]
            if self._get_view(rname) is None:
                continue
            srcs = []
            for s in self.pair_of[r]:
                if s in self.name_of and self._get_view(self.name_of[s]):
                    srcs.append(self.name_of[s])
            view_list.append((rname, srcs))
        if not view_list:
            return None
        fused = self.fusion.fuse_block(self.views, view_list,
                                       scene_range=bbx)
        scene = f"scene_{bi}"
        out_ply = _join(pipe.fusion_path, f"{scene}.ply")
        write_ply(out_ply, fused.xyz, fused.normals, fused.colors)
        tf.write_border(_join(pipe.fusion_path, f"{scene}.txt"), bbx)
        pipe._write_mvs_scene(
            _join(pipe.fusion_path, f"{scene}.mvs"), self.views, fused)
        print(f"[fusion] {scene}: {fused.xyz.shape[0]} points")
        return out_ply
