from .spec import QuerySpec, REGISTRY, register, all_specs

__all__ = ["QuerySpec", "REGISTRY", "register", "all_specs"]
