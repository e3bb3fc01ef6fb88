"""Standalone fusion CLI (parity with the reference's
fuse/fusion_3d_normal.py argparse entry, :30-52): fuse already-produced
depth maps in a workspace without re-running the other stages."""

import argparse


def main():
    ap = argparse.ArgumentParser(description="Fuse depth maps to point clouds")
    ap.add_argument("--project_folder", required=True,
                    help="export dir with viewpair/blocks/image_path.txt")
    ap.add_argument("--mvs_path", required=True, help="dir with *_init.pfm etc")
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--fusion_num", type=int, default=10)
    ap.add_argument("--min_geo_consist_num", type=int, default=4)
    ap.add_argument("--photomatric_threshold", type=float, default=0.2)
    ap.add_argument("--position_threshold", type=float, default=1.0)
    ap.add_argument("--depth_threshold", type=float, default=0.01)
    ap.add_argument("--normal_threshold", type=float, default=90.0)
    ap.add_argument("--pc_format", default="ply", choices=["ply", "las"])
    args = ap.parse_args()

    import os

    from ..io import text_formats as tf
    from ..io.pfm import read_pfm
    from ..io.ply import write_ply
    from . import DepthFusion, FusionConfig, ViewGeometry
    from .fuse import ViewData

    os.makedirs(args.output_path, exist_ok=True)
    _, names = tf.read_image_paths(
        os.path.join(args.project_folder, "image_path.txt"))
    pairs = tf.read_view_pairs(os.path.join(args.project_folder, "viewpair.txt"))
    blocks = tf.read_blocks(os.path.join(args.project_folder, "blocks.txt"))
    name_of = {i: os.path.splitext(n)[0] for i, n in names.items()}

    views = {}
    for vid, name in name_of.items():
        dpath = os.path.join(args.mvs_path, f"{name}_init.pfm")
        cpath = os.path.join(args.mvs_path, f"{name}.txt")
        if not (os.path.exists(dpath) and os.path.exists(cpath)):
            continue
        cam = tf.read_mvs_cam(cpath)
        depth = read_pfm(dpath)[0]
        ppath = os.path.join(args.mvs_path, f"{name}_prob.pfm")
        prob = read_pfm(ppath)[0] if os.path.exists(ppath) else None
        views[name] = ViewData(
            name=name, image_id=cam.image_id,
            geom=ViewGeometry.create(cam.K, cam.T_cw),
            depth=depth, prob=prob,
        )

    fusion = DepthFusion(FusionConfig(
        fusion_num=args.fusion_num,
        min_geo_consist=args.min_geo_consist_num,
        photometric_threshold=args.photomatric_threshold,
        position_threshold=args.position_threshold,
        depth_threshold=args.depth_threshold,
        normal_threshold_deg=args.normal_threshold,
        pc_format=args.pc_format,
    ))
    pair_of = {r: [s for s, _ in p] for r, p in pairs}

    for bi, (bbx, refs) in enumerate(blocks):
        view_list = [
            (name_of[r], [name_of[s] for s in pair_of.get(r, []) if s in name_of])
            for r in refs if r in name_of and name_of[r] in views
        ]
        if not view_list:
            continue
        fused = fusion.fuse_block(views, view_list, scene_range=bbx)
        scene = f"scene_{bi}"
        if args.pc_format == "las":
            from ..io.las import write_las

            out = os.path.join(args.output_path, f"{scene}.las")
            write_las(out, fused.xyz, fused.colors)
        else:
            out = os.path.join(args.output_path, f"{scene}.ply")
            write_ply(out, fused.xyz, fused.normals, fused.colors)
        tf.write_border(os.path.join(args.output_path, f"{scene}.txt"), bbx)
        print(f"[fusion] {scene}: {fused.xyz.shape[0]} points -> {out}")


if __name__ == "__main__":
    main()
