"""Text-augmentation kernels (training-data augmentation).

Behavioral ports of the reference's offline augmenters — exact RNG-stream
parity with the global numpy RNG the reference consumes:

- swap_char_position (/root/reference/jionlp/textaug/swap_char_position.py:
  41-114): per-char Bernoulli(swap_ratio) → Gaussian-offset swap within the
  surrounding run of Chinese chars.
- random_add_delete (textaug/random_add_delete.py:59-129): per-char
  Bernoulli inserts (non-Chinese chars sampled from the smoothed corpus
  char distribution) and deletes.
- replace_entity (textaug/replace_entity.py:57-129): swap a random entity
  span for a same-type dictionary entry, shifting downstream offsets.

back_translation (network APIs) and homophone_substitution (jiojio CWS
model) are out of scope per SURVEY §2.5.

All three take ``rng`` (default: the global ``numpy.random`` module, same
as the reference) so the distributed operator can inject a per-document
``numpy.random.RandomState(seed + doc_id)`` for reproducible parallel runs.
"""

from __future__ import annotations

import numpy as np

from .extractors import RuleExtractor

_check_zh = RuleExtractor.check_any_chinese_char


class SwapCharPosition:
    def __init__(self, swap_ratio: float = 0.02, scale: float = 1.0,
                 seed: int = 1, rng=None) -> None:
        self.swap_ratio = swap_ratio
        self.scale = scale
        self.rng = rng if rng is not None else np.random
        if rng is None and seed != 0:
            import random as _random
            _random.seed(seed)  # reference seeds stdlib random (:45-48)

    def _swap_position(self, char_list, orig_pos):
        start_pos = 0
        end_pos = -1
        while orig_pos + start_pos > 0 \
                and _check_zh(char_list[orig_pos + start_pos - 1]):
            start_pos -= 1
        while orig_pos + end_pos < len(char_list) - 1 \
                and _check_zh(char_list[orig_pos + end_pos + 1]):
            end_pos += 1
        if orig_pos + start_pos == orig_pos + end_pos:
            return orig_pos
        while True:
            res = round(self.rng.normal(0, self.scale))
            if res == 0:
                continue
            if start_pos <= res <= end_pos:
                break
        return res + orig_pos

    def _augment_one(self, text):
        char_list = list(text)
        for i in range(len(char_list)):
            if self.rng.uniform(0, 1) < self.swap_ratio:
                if not _check_zh(char_list[i]):
                    continue
                j = self._swap_position(char_list, i)
                char_list[i], char_list[j] = char_list[j], char_list[i]
        return ''.join(char_list)

    def __call__(self, text: str, augmentation_num: int = 3) -> list:
        out: list = []
        count = 0
        while len(out) < augmentation_num:
            aug = self._augment_one(text)
            count += 1
            if count > min(augmentation_num / self.swap_ratio, len(text) / 2):
                break
            if aug == text:
                continue
            if aug not in out:
                out.append(aug)
        return out


class RandomAddDelete:
    def __init__(self, char_distribution: dict, add_ratio: float = 0.02,
                 delete_ratio: float = 0.02, seed: int = 1,
                 rng=None) -> None:
        # smoothed non-Chinese insertion distribution
        # (random_add_delete.py:63-77): exp(log10(total)) over chars that
        # are neither Chinese nor common punctuation
        dist = {}
        for char, info in char_distribution.items():
            if not _check_zh(char) and char not in '，：。;“”；…！!?？':
                dist[char] = np.exp(np.log10(info['total_num']))
        total = sum(dist.values())
        self.char_keys = list(dist.keys())
        self.char_probs = [v / total for v in dist.values()]
        self.add_ratio = add_ratio
        self.delete_ratio = delete_ratio
        self.rng = rng if rng is not None else np.random
        if rng is None and seed != 0:
            self.rng.seed(seed)

    def _augment_one(self, text):
        out = []
        for char in text:
            if self.rng.uniform(0, 1) < self.add_ratio:
                out.append(self.rng.choice(self.char_keys,
                                           p=self.char_probs))
            if self.rng.uniform(0, 1) < self.delete_ratio:
                pass
            else:
                out.append(char)
        return ''.join(out)

    def __call__(self, text: str, augmentation_num: int = 3) -> list:
        out: list = []
        count = 0
        while len(out) < augmentation_num:
            aug = self._augment_one(text)
            count += 1
            if count > min(augmentation_num
                           / (self.add_ratio + self.delete_ratio),
                           len(text) / 2):
                break
            if aug == text:
                continue
            if aug not in out:
                out.append(aug)
        return out


class ReplaceEntity:
    def __init__(self, entities_dict: dict, replace_ratio: float = 0.1,
                 seed: int = 1, rng=None) -> None:
        self.entities_dict = entities_dict
        self.replace_ratio = replace_ratio
        self.rng = rng if rng is not None else np.random
        if rng is None and seed != 0:
            self.rng.seed(seed)

    def _augment_one(self, text, entities):
        orig_text = text
        count = 0
        guard = 0
        # reference loop condition kept verbatim (replace_entity.py:96);
        # the extra `guard` cap prevents an executor livelock when no
        # replacement can ever succeed (unreachable in sane configs)
        while (orig_text == text or count > 20) and guard < 10000:
            count += 1
            guard += 1
            if self.rng.random() < self.replace_ratio:
                orig_entity = self.rng.choice(entities)
                candidates = list(
                    self.entities_dict[orig_entity['type']].keys())
                if len(candidates) == 0:
                    continue
                new_text = self.rng.choice(candidates)
                len_bias = len(new_text) - len(orig_entity['text'])
                new_entity = {'text': new_text, 'type': orig_entity['type'],
                              'offset': [orig_entity['offset'][0],
                                         orig_entity['offset'][1]
                                         + len_bias]}
                text = ''.join([text[:orig_entity['offset'][0]], new_text,
                                text[orig_entity['offset'][1]:]])
                orig_index = entities.index(orig_entity)
                new_entities = entities[:orig_index]
                new_entities.append(new_entity)
                for e in entities[orig_index + 1:]:
                    new_entities.append(
                        {'text': e['text'], 'type': e['type'],
                         'offset': (e['offset'][0] + len_bias,
                                    e['offset'][1] + len_bias)})
                entities = new_entities
        return text, entities

    def __call__(self, text: str, entities: list,
                 augmentation_num: int = 3) -> tuple:
        entities = sorted(entities, key=lambda i: i['offset'][0])
        texts: list = []
        ents: list = []
        count = 0
        while len(texts) < augmentation_num:
            aug_text, aug_entities = self._augment_one(text, entities)
            count += 1
            if count > min(augmentation_num / self.replace_ratio, len(text)):
                break
            if aug_text == text:
                continue
            if aug_text not in texts:
                texts.append(aug_text)
                ents.append(aug_entities)
        return texts, ents
