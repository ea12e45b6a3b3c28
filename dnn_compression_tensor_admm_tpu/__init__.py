"""TPU-native tensor-decomposition DNN compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
miaoyin390/DNN-Compression-Tensor-ADMM (CVPR'21 "Towards Efficient Tensor
Decomposition-Based DNN Model Compression with Optimization Framework"):

  * ADMM training of dense CNNs/ViTs with rank-constrained auxiliary
    variables (Z) projected by truncated TT-SVD / partial Tucker / SVD,
    run entirely on device (reference runs them on host NumPy).
  * Factorized layer library (TT / Tucker-2 / SVD convs and linears) with
    both factorized-forward and reconstruct-forward execution modes.
  * Model zoo (CIFAR/ImageNet ResNets, DeiT/ViT, MobileNetV2, DenseNet,
    VGG) built from a single layer-substitution mechanism.
  * Data-parallel training over a `jax.sharding.Mesh` with the Z-projection
    sharded across a `layer` axis.

Import as `import dnn_compression_tensor_admm_tpu as dcta`.
"""

__version__ = "0.1.0"
