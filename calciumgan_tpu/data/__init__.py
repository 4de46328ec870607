"""Data layer: offline preprocessing + input pipeline.

- :mod:`tfrecord`: pure-Python TFRecord container + ``tf.train.Example``
  codec (byte-compatible with the reference's datasets, no TensorFlow
  dependency).
- :mod:`segments`: sliding-window segmentation / FFT / conv2d reshape /
  normalisation (parity with ``dataset/generate_tfrecords.py``).
- :mod:`pipeline`: dataset loading (TFRecord shards or surrogate pickles)
  and a device prefetcher that stages sharded batches onto the mesh.
"""
