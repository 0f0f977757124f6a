from .polymul import (monomial_rotate, negacyclic_matrix, negacyclic_polymul,
                      np_negacyclic_polymul)

__all__ = ["monomial_rotate", "negacyclic_matrix", "negacyclic_polymul",
           "np_negacyclic_polymul"]
