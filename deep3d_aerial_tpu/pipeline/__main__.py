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
    args = ap.parse_args()

    cfg = PipelineConfig.from_yaml(args.config)
    AerialPipeline(args.workspace_folder, cfg).run_dense()


if __name__ == "__main__":
    main()
