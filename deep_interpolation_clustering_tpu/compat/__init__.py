from .torch_import import import_torch_state_dict, export_to_torch_state_dict

__all__ = ["import_torch_state_dict", "export_to_torch_state_dict"]
