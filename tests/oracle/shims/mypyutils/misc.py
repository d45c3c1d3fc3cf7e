def none_switch(value, default):
    return default if value is None else value
