from .tight_binding import integer_lattice, synthetic_wannier, tb_graphene, tb_integer

__all__ = ["integer_lattice", "synthetic_wannier", "tb_graphene", "tb_integer"]
