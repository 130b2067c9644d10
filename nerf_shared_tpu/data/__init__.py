from nerf_shared_tpu.data.datasets import load_datasets

__all__ = ["load_datasets"]
