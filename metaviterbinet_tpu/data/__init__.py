from metaviterbinet_tpu.data.dataset import ChannelDataset, generate_words  # noqa: F401
