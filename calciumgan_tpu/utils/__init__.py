"""Infrastructure: HDF5 IO, TensorBoard event writing, checkpointing,
array-format utilities, and the Summary observability facade."""
