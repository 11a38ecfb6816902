"""Data layer: CALVIN/TACO on-disk formats -> device-resident training batches.

Host responsibilities are deliberately minimal (read frames, slice windows,
pad, collate uint8); every transform that touches pixels runs fused on the
TPU inside the train step (``hulc2_tpu.data.device_transforms``). Images ship
host->device as uint8 NHWC — 4x less PCIe/DMA traffic than the reference's
float32 CHW tensors.
"""
