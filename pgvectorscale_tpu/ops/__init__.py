"""Device kernels: distances, quantization, packed-code Hamming, top-k."""
