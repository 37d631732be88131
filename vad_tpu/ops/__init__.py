from vad_tpu.ops.losses import combined_loss, mse_loss, ssim_loss  # noqa: F401
