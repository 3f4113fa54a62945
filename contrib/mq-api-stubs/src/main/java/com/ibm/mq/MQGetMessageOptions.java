package com.ibm.mq;

/** OFFLINE COMPILE-CHECK STUB — see {@link MQException} header. */
public class MQGetMessageOptions {
    public int options;
}
