"""Hand-written TPU kernels (Pallas) for the hot contractions XLA cannot
schedule at roofline: the CCSD(T) permutation epilogue lives here."""
