"""TPU-native LoRA fine-tuning for the edit transformer."""
