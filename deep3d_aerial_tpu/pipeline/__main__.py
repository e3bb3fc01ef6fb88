"""CLI: python -m deep3d_aerial_tpu.pipeline --workspace WS --config cfg.yaml

Mirrors the reference entry (/root/reference/run.py:287-306).
"""

import argparse

from .config import PipelineConfig
from .orchestrator import AerialPipeline


def main():
    ap = argparse.ArgumentParser(description="TPU-native aerial MVS pipeline")
    ap.add_argument("--workspace_folder", "--workspace", required=True)
    ap.add_argument("--config", required=True, help="pipeline YAML config")
    ap.add_argument("--data_folder", default=None,
                    help="image root (builds export/image_path.txt if absent)")
    ap.add_argument("--pipelined", action="store_true",
                    help="overlap host fusion with device inference")
    args = ap.parse_args()

    cfg = PipelineConfig.from_yaml(args.config)
    pipe = AerialPipeline(args.workspace_folder, cfg,
                          data_folder=args.data_folder)
    if args.pipelined:
        pipe.run_dense_pipelined()
    else:
        pipe.run_dense()


if __name__ == "__main__":
    main()
