from scgrhc.utils.synth import make_synthetic_database

__all__ = ["make_synthetic_database"]
