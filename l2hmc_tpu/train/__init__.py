"""Training layer: jitted train/eval/hmc steps + era/epoch orchestration."""
