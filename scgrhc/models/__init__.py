from scgrhc.models import attention, critic, generator, torch_compat

__all__ = ["attention", "critic", "generator", "torch_compat"]
