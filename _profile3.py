import sys
sys.path.insert(0, "/root/repo")
exec(open("_profile2.py").read().replace('bench("baseline (full)", [])', '').replace('bench("no augmentation", [], use_aug=False)', '''bench("mlp decoder", ["model.action_decoder.rnn_model=mlp_decoder"])
bench("gru decoder", ["model.action_decoder.rnn_model=gru_decoder"])'''))
