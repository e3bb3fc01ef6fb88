"""Top-level CLI alias: python -m deep3d_aerial_tpu == pipeline entry."""

from .pipeline.__main__ import main

if __name__ == "__main__":
    main()
