from pcmseg_tpu.models.unet3d import UNet3D  # noqa: F401
