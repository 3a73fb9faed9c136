"""NER dataset format converters (entity ⟷ BIOES tags, char ⟷ word token
levels) and span-level P/R/F1.

Behavioral ports of the reference converters
(/root/reference/jionlp/algorithm/ner/ner_data_converter.py:44-273) and the
measure logic (algorithm/ner/measure.py).  Pure Python — used both as
runtime ops (e.g. turning the mention table into BIOES training rows for a
tagger) and by the parity harness.
"""

from __future__ import annotations


def entity2tag(token_list, entities) -> list:
    """entity dicts → BIOES tag list; overlapping later entities are
    dropped (ner_data_converter.py:68-95)."""
    tags = ['O'] * len(token_list)
    flag = 0
    entities = sorted(entities, key=lambda i: i['offset'][0])
    for entity in entities:
        if entity['offset'][1] < flag:
            continue  # overlap: later entity ignored (reference warns only)
        if entity['offset'][1] - entity['offset'][0] == 1:
            tags[entity['offset'][0]] = 'S-' + entity['type']
        else:
            tags[entity['offset'][0]] = 'B-' + entity['type']
            if entity['offset'][1] - entity['offset'][0] > 2:
                for j in range(entity['offset'][0] + 1,
                               entity['offset'][1] - 1):
                    tags[j] = 'I-' + entity['type']
            tags[entity['offset'][1] - 1] = 'E-' + entity['type']
        flag = entity['offset'][1]
    return tags


def tag2entity(token_list, tags) -> list:
    """BIOES tags → entity dicts; malformed sequences are skipped exactly
    like the reference (ner_data_converter.py:118-158), including the
    early-return on an unknown prefix."""
    entities: list = []
    start = None
    for idx, (tag, token) in enumerate(zip(tags, token_list)):
        prefix = tag[0]
        if tag == 'O':
            start = None
            continue
        elif prefix in 'I':
            continue
        elif prefix == 'E':
            if start is None:
                continue
            key, value = tags[start][2:], token_list[start: idx + 1]
        else:
            if prefix in 'S':
                key, value = tag[2:], token
                start = idx
            elif prefix == 'B':
                start = idx
                continue
            else:
                return entities
        entities.append({'type': key, 'text': ''.join(value),
                         'offset': (start, idx + 1)})
        start = None
    return entities


def char2word(char_entity_list, word_token_list) -> list:
    """char-level entities → word-level; entities that straddle a word
    boundary are dropped (ner_data_converter.py:192-231)."""
    idx_flag = 0
    idx_list = [0]
    for word in word_token_list:
        idx_flag += len(word)
        idx_list.append(idx_flag)
    out = []
    for ent in char_entity_list:
        try:
            start = idx_list.index(ent['offset'][0])
            end = idx_list.index(ent['offset'][1])
            out.append({'type': ent['type'], 'offset': [start, end],
                        'text': ent['text']})
        except ValueError:
            pass  # segmentation conflict: dropped (reference warns only)
    return out


def word2char(word_entity_list, word_token_list) -> list:
    """word-level entities → char-level (ner_data_converter.py:234-273)."""
    idx_flag = 0
    idx_list = []
    for word in word_token_list:
        idx_list.append(idx_flag)
        idx_flag += len(word)
    idx_list.append(idx_flag)
    return [{'type': e['type'],
             'offset': [idx_list[e['offset'][0]], idx_list[e['offset'][1]]],
             'text': ''.join(word_token_list[e['offset'][0]:
                                             e['offset'][1]])}
            for e in word_entity_list]


def entity_f1(gold: list, pred: list) -> dict:
    """Span-level micro P/R/F1 over (offset, type) matches (the measure
    logic of ner/measure.py, used by our parity harness)."""
    gold_set = {(tuple(e['offset']), e['type']) for e in gold}
    pred_set = {(tuple(e['offset']), e['type']) for e in pred}
    tp = len(gold_set & pred_set)
    p = tp / len(pred_set) if pred_set else 0.0
    r = tp / len(gold_set) if gold_set else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {'precision': p, 'recall': r, 'f1': f1,
            'tp': tp, 'n_gold': len(gold_set), 'n_pred': len(pred_set)}


# ---------------------------------------------------------------------------
# CWS (word segmentation) dataset converters — ports of
# algorithm/cws/cws_data_converter.py:36-145 (BI tagging standard)

def cws_word2tag(word_list) -> tuple:
    """word list → (chars, BI tag list) (cws_data_converter.py:36-67)."""
    chars = ''.join(word_list)
    tags = []
    for word in word_list:
        tags.append('B')
        tags.extend('I' * (len(word) - 1))
    return chars, tags


def cws_tag2word(chars: str, tags) -> list:
    """(chars, BI tags) → word list, replaying the reference's exact
    malformed-sequence behavior (cws_data_converter.py:70-145), including
    the early return on an unknown tag."""
    tag_length = len(tags)
    if tag_length == 1:
        return [chars]
    word_list = []
    start = None
    for idx, tag in enumerate(tags):
        if tag == 'I':
            if idx == 0:
                start = idx
                continue
            elif idx == tag_length - 1:
                word = chars[start:]
            else:
                continue
        elif tag == 'B':
            if idx == 0:
                start = idx
                continue
            elif idx == tag_length - 1:
                word_list.append(chars[start: idx])
                word = chars[-1]
            else:
                if start is None:
                    continue
                word = chars[start: idx]
                start = idx
        else:
            return word_list
        word_list.append(word)
    return word_list


def _entity_ok(entity) -> bool:
    """text/offset consistency guard (ner_entity_compare.py:14-19)."""
    return len(entity['text']) == entity['offset'][1] - entity['offset'][0]


def entity_compare(text, labeled_entities, predicted_entities,
                   context_pad: int = 10) -> list:
    """Gold-vs-predicted disagreement pairs with context — behavioral port
    of the reference (algorithm/ner/ner_entity_compare.py:22-206),
    including its quirks, reproduced deliberately:

    - a labeled entity ranked after every predicted entity is NEVER
      reported missing (the scan only emits via the 'predicted jumped
      past' branch);
    - a predicted entity that precedes all labeled entities is paired WITH
      that first labeled entity (not None) in the second loop's
      stop_flag==0 branch.
    """
    n = len(text)

    def ctx(lo, hi):
        return text[max(lo - context_pad, 0): min(hi + context_pad, n)]

    gold = sorted((e for e in labeled_entities if _entity_ok(e)),
                  key=lambda e: e['offset'][0])
    pred = sorted((e for e in predicted_entities if _entity_ok(e)),
                  key=lambda e: e['offset'][0])
    diffs: list = []

    if not gold:
        for p in pred:
            diffs.append({'context': ctx(p['offset'][0], p['offset'][1]),
                          'labeled_entity': None, 'predicted_entity': p})
        return diffs
    if not pred:
        for g in gold:
            diffs.append({'context': ctx(g['offset'][0], g['offset'][1]),
                          'labeled_entity': g, 'predicted_entity': None})
        return diffs

    for g in gold:
        stop_flag = 0
        for p in pred:
            if p['offset'][1] <= g['offset'][0]:
                continue
            elif p['offset'][0] >= g['offset'][1]:
                if stop_flag == 1:
                    break
                elif stop_flag == 0:
                    diffs.append({'context': ctx(g['offset'][0],
                                                 g['offset'][1]),
                                  'labeled_entity': g,
                                  'predicted_entity': None})
                    break
            elif p['offset'][0] == g['offset'][0] and \
                    p['offset'][1] == g['offset'][1]:
                if p['type'] == g['type']:
                    break
                diffs.append({'context': ctx(g['offset'][0],
                                             g['offset'][1]),
                              'labeled_entity': g, 'predicted_entity': p})
                break
            if stop_flag == 0:
                stop_flag += 1
            diffs.append({'context': ctx(min(g['offset'][0],
                                             p['offset'][0]),
                                         max(g['offset'][1],
                                             p['offset'][1])),
                          'labeled_entity': g, 'predicted_entity': p})

    for p in pred:
        stop_flag = 0
        for gi, g in enumerate(gold):
            if p['offset'][0] >= g['offset'][1]:
                if gi == len(gold) - 1:
                    diffs.append({'context': ctx(p['offset'][0],
                                                 p['offset'][1]),
                                  'labeled_entity': None,
                                  'predicted_entity': p})
                continue
            elif p['offset'][1] <= g['offset'][0]:
                if stop_flag == 0:
                    diffs.append({'context': ctx(p['offset'][0],
                                                 p['offset'][1]),
                                  'labeled_entity': g,
                                  'predicted_entity': p})
                    break
                elif stop_flag == 1:
                    break
            if stop_flag == 0:
                stop_flag += 1
    return diffs
