"""TPU-native sound-source localization framework (see README.md)."""
